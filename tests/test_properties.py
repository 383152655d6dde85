"""Property tests (SURVEY §5 item 5) over the numpy kernels — fast, no Spark
round-trips; the Spark layer is a thin orchestrator over these."""

from __future__ import annotations

import numpy as np
from hypothesis import assume, given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from polars_quant_spark.backtest.vectorized import BacktestParams, _fold
from polars_quant_spark.operators import recurrence as rec

prices = arrays(
    np.float64,
    st.integers(40, 120),
    elements=st.floats(1.0, 1000.0, allow_nan=False),
)


@given(prices, st.floats(0.1, 10.0))
@settings(max_examples=50, deadline=None)
def test_rsi_scale_invariant(x, a):
    """RSI is invariant under positive scaling — provided the scaling does not
    flip any diff's sign through float rounding (ulp-scale diffs in x can
    collapse to exactly 0 in a·x, which legitimately moves RSI between the
    0/0→100 guard and 0-vs-eps gains; TA-Lib behaves the same way)."""
    assume((np.sign(np.diff(x)) == np.sign(np.diff(a * x))).all())
    r1 = rec.rsi(x, 14)
    r2 = rec.rsi(a * x, 14)
    np.testing.assert_allclose(r1, r2, rtol=1e-6, atol=1e-6, equal_nan=True)


@given(prices, st.floats(0.1, 10.0))
@settings(max_examples=50, deadline=None)
def test_ema_scale_equivariant(x, a):
    """EMA commutes with positive scaling."""
    np.testing.assert_allclose(
        rec.ema(a * x, 10), a * rec.ema(x, 10), rtol=1e-9, equal_nan=True
    )


@given(prices)
@settings(max_examples=50, deadline=None)
def test_null_insertion_idempotent(x):
    """Inserting NaNs must not change outputs at the valid positions
    (reference null-skipping, overlap.rs:891-895)."""
    withnan = np.insert(x, len(x) // 2, np.nan)
    e_dense = rec.ema(x, 10)
    e_nan = rec.ema(withnan, 10)
    mask = ~np.isnan(withnan)
    np.testing.assert_allclose(e_nan[mask], e_dense, rtol=1e-12, equal_nan=True)
    assert np.isnan(e_nan[len(x) // 2])


@given(prices)
@settings(max_examples=50, deadline=None)
def test_atr_nonnegative(x):
    h = x * 1.01
    l = x * 0.99
    a = rec.atr(h, l, x, 14)
    valid = a[~np.isnan(a)]
    assert (valid >= -1e-12).all()


@given(prices)
@settings(max_examples=50, deadline=None)
def test_adx_bounded(x):
    h, l = x * 1.01, x * 0.99
    a = rec.adx(h, l, x, 5)
    valid = a[~np.isnan(a)]
    assert ((valid >= -1e-9) & (valid <= 100.0 + 1e-9)).all()


@given(prices)
@settings(max_examples=30, deadline=None)
def test_backtest_equity_identity_and_roundtrip(price):
    """equity == cash + pos·price every bar; with zero costs a full round
    trip conserves value at the traded prices."""
    n = price.shape[0]
    rng = np.random.default_rng(0)
    buy = rng.random(n) < 0.2
    sell = rng.random(n) < 0.2
    p = BacktestParams(
        buy_commission_rate=0.0, sell_commission_rate=0.0, min_commission=0.0
    )
    pos, cash, eq, dd, trades, wins = _fold(price, buy, sell, p)
    np.testing.assert_allclose(eq, cash + pos * price, rtol=1e-12)
    assert (cash >= -1e-9).all()
    assert (dd >= -1e-12).all() and (dd <= 1.0 + 1e-12).all()


@given(prices)
@settings(max_examples=30, deadline=None)
def test_no_signals_no_change(price):
    n = price.shape[0]
    p = BacktestParams()
    pos, cash, eq, dd, trades, wins = _fold(
        price, np.zeros(n, bool), np.zeros(n, bool), p
    )
    assert trades == 0
    np.testing.assert_allclose(eq, p.initial_capital)


@given(prices)
@settings(max_examples=30, deadline=None)
def test_sar_within_price_range(x):
    h, l = x * 1.02, x * 0.98
    s = rec.sar(h, l)
    valid = s[~np.isnan(s)]
    assert (valid >= l.min() - 1e-9).all()
    assert (valid <= h.max() + 1e-9).all()


@given(prices)
@settings(max_examples=30, deadline=None)
def test_sarext_default_equals_signed_sar(x):
    h, l = x * 1.01, x * 0.99
    s = rec.sar(h, l)
    se = rec.sarext(h, l)
    np.testing.assert_allclose(np.abs(se), s, rtol=1e-12, equal_nan=True)


@given(
    n_tokens=st.integers(min_value=1, max_value=300),
    size=st.integers(min_value=2, max_value=64),
    stride_frac=st.floats(min_value=0.2, max_value=1.0),
)
@settings(max_examples=12, deadline=None)
def test_chunking_covers_every_token_property(spark, n_tokens, size, stride_frac):
    """For ANY (doc length, size, stride≤size): chunk spans tile the token
    stream with no gaps, no out-of-range indices, and stride-spaced
    starts (session-scoped fixture — allowed under hypothesis)."""
    import pandas as pd

    from polars_quant_spark.operators import text as T

    stride = max(1, min(size, int(size * stride_frac)))
    pdf = pd.DataFrame(
        {"doc_id": [1], "text": [" ".join(f"w{i}" for i in range(n_tokens))]}
    )
    rows = (
        T.chunk_documents(spark.createDataFrame(pdf), size=size, stride=stride)
        .orderBy("chunk_id")
        .collect()
    )
    starts = [r["tok_start"] for r in rows]
    assert starts == [i * stride for i in range(len(rows))]
    assert starts[-1] < n_tokens  # no empty trailing chunk
    covered = set()
    for r in rows:
        assert 0 <= r["tok_start"] < r["tok_end"] <= n_tokens
        assert r["tok_end"] - r["tok_start"] <= size
        covered.update(range(r["tok_start"], r["tok_end"]))
    assert covered == set(range(n_tokens))


# ---------------------------------------------------------------------------
# Round-5 codec layers: random-input roundtrip invariants (no Spark)
# ---------------------------------------------------------------------------


@given(
    st.integers(1, 6),
    st.integers(1, 6),
    st.integers(0, 10_000),
)
@settings(max_examples=30, deadline=None)
def test_jpeg_block_constant_roundtrip_any_grid(wb, hb, seed):
    """ANY block-constant grayscale image survives the flat-table JPEG
    encode→decode bit-exactly — not just the id-keyed generator grid. This
    is the load-bearing invariant behind the media_jpeg_features oracle."""
    from polars_quant_spark.operators import multimodal as mm

    rng = np.random.default_rng(seed)
    blocks = rng.integers(0, 256, size=(hb, wb)).astype(np.uint8)
    img = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
    out = mm._jpeg_pixels(mm._jpeg_encode(img))
    assert (out[:, :, 0] == img).all()


@given(
    st.integers(8, 48),
    st.integers(8, 48),
    st.integers(0, 10_000),
)
@settings(max_examples=20, deadline=None)
def test_jpeg_lossy_error_bounded_on_random_images(h, w, seed):
    """Arbitrary uint8 images through the standard Annex K table stay
    within baseline-JPEG error bounds (exercises AC run/size, ZRL, byte
    stuffing on random high-entropy data)."""
    from polars_quant_spark.operators import multimodal as mm

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
    dec = mm._jpeg_pixels(mm._jpeg_encode(img, mm._JPEG_QTBL_STD))[:, :, 0]
    # random noise is the worst case for JPEG; bound is loose but real —
    # a Huffman/zigzag/stuffing bug produces garbage far beyond it
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 40


@given(st.integers(0, 1_000_000))
@settings(max_examples=50, deadline=None)
def test_mp4_box_walk_total_bytes_accounted(i):
    """The box walker's census is consistent: every byte of the container
    belongs to a counted top-level box, and the parsed metadata matches
    the generator for arbitrary ids (not just the oracle's 24)."""
    from polars_quant_spark.operators import multimodal as mm

    p = mm._make_mp4(i)
    m = mm.parse_mp4(p)
    assert m["duration"] == (i % 30 + 1) * 100
    assert m["n_tracks"] == 1 + (i % 2)
    assert m["mdat_bytes"] == 256 + (i % 7) * 64
    assert m["n_boxes"] == 4 + 2 * m["n_tracks"]


@given(st.integers(0, 1_000_000))
@settings(max_examples=50, deadline=None)
def test_mp3_frame_walk_arbitrary_ids(i):
    from polars_quant_spark.operators import multimodal as mm

    m = mm.parse_mp3(mm._make_mp3(i))
    kbps = [64, 128, 192, 256][i % 4]
    sr = [44100, 48000, 32000][i % 3]
    assert m["n_frames"] == 10 + (i % 5) * 5
    assert m["stream_bytes"] == m["n_frames"] * (144_000 * kbps // sr)
    assert m["samplerate"] == sr


@given(
    st.integers(1, 14),
    st.integers(0, 2),
    st.integers(1, 8),
    st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_mp3_any_valid_header_combo(br_idx, sr_idx, n_frames, padding):
    """Every (bitrate, samplerate, padding) combination the MPEG-1 L3
    header can express walks cleanly with the table-driven frame length."""
    from polars_quant_spark.operators import multimodal as mm

    kbps = mm._MP3_BITRATES[br_idx]
    sr = mm._MP3_RATES[sr_idx]
    pad = 1 if padding else 0
    flen = 144_000 * kbps // sr + pad
    hdr = bytes([0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2) | (pad << 1), 0x00])
    stream = (hdr + b"\x00" * (flen - 4)) * n_frames
    m = mm.parse_mp3(stream)
    assert m["n_frames"] == n_frames
    assert m["stream_bytes"] == n_frames * flen
    assert (m["bitrate_kbps"], m["samplerate"]) == (kbps, sr)


@given(st.integers(1, 3))
@settings(max_examples=6, deadline=None)
def test_mp3_trailing_junk_raises(n_junk):
    """1-3 trailing bytes after the last frame slip under the `pos + 4 <=
    len` loop guard; the raises-rather-than-mis-parses contract demands a
    ValueError, not a silently short stream_bytes census (ADVICE r5)."""
    import pytest

    from polars_quant_spark.operators import multimodal as mm

    with pytest.raises(ValueError, match="trailing junk"):
        mm.parse_mp3(mm._make_mp3(7) + b"\x00" * n_junk)
