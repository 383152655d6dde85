"""Independent transcription of the reference's HT_/MESA contract.

This is a SECOND implementation of /root/reference/src/talib/cycle.rs,
deliberately structured like the Rust (scalar state + 7-slot ring buffers,
one self-contained function per indicator) rather than like the package's
vectorized array state machine (polars_quant_spark/operators/hilbert.py).
tests/test_mesa_reference_parity.py asserts the two agree element-wise, so
the HT family's correctness no longer rests on the package's own
self-generated golden file: a bug in either implementation breaks parity
unless independently reproduced in both.

Contract citations: cycle.rs:20-68 (shared state preamble), :66-68 (31-bar
warmup), :16-18 (all-null under 32 rows), :131-143 (DCPHASE adjustments),
:295-302 (SINE uses the unadjusted phase), :365-377 (trendline = 4-bar
price average), :434-443 (trendmode threshold), :455-470 (ring shift and
calc_smooth).
"""

from __future__ import annotations

import math


def _ring_push(ring: list[float], val: float) -> None:
    ring.insert(0, val)
    del ring[7:]


def _fir(ring: list[float], adj: float) -> float:
    def at(k: int) -> float:
        return ring[k] if k < len(ring) else 0.0

    return (0.0962 * at(0) + 0.5769 * at(2) - 0.5769 * at(4) - 0.0962 * at(6)) * adj


def _smooth_series(prices: list[float]) -> list[float]:
    out = [0.0] * len(prices)
    for i in range(3, len(prices)):
        out[i] = (
            4.0 * prices[i]
            + 3.0 * prices[i - 1]
            + 2.0 * prices[i - 2]
            + prices[i - 3]
        ) * 0.1
    return out


def _run(prices: list[float]):
    """Yields (i, i1_head, q1_head, period, smooth_period) per bar from 6."""
    smooth = _smooth_series(prices)
    detrend: list[float] = []
    q1: list[float] = []
    i1: list[float] = []
    i2 = q2 = re = im = 0.0
    period = 0.0
    smooth_period = 0.0
    for i in range(6, len(prices)):
        prev_p = period if i > 6 else 6.0
        adj = 0.075 * prev_p + 0.54
        s = smooth
        d_curr = (
            0.0962 * s[i] + 0.5769 * s[i - 2] - 0.5769 * s[i - 4] - 0.0962 * s[i - 6]
        ) * adj
        _ring_push(detrend, d_curr)
        _ring_push(q1, _fir(detrend, adj))
        _ring_push(i1, detrend[3] if len(detrend) > 3 else 0.0)
        ji = _fir(i1, adj)
        jq = _fir(q1, adj)
        i2_curr = 0.2 * (i1[0] - jq) + 0.8 * i2
        q2_curr = 0.2 * (q1[0] + ji) + 0.8 * q2
        re_curr = 0.2 * (i2_curr * i2 + q2_curr * q2) + 0.8 * re
        im_curr = 0.2 * (i2_curr * q2 - q2_curr * i2) + 0.8 * im
        i2, q2, re, im = i2_curr, q2_curr, re_curr, im_curr
        if im != 0.0 and re != 0.0:
            period = 2.0 * math.pi / math.atan(im / re)
        period = min(max(period, 0.67 * prev_p), 1.5 * prev_p)
        period = min(max(period, 6.0), 50.0)
        period = 0.2 * period + 0.8 * prev_p
        smooth_period = 0.33 * period + 0.67 * smooth_period
        yield i, i1[0], q1[0], period, smooth_period


def ht_dcperiod(prices: list[float]) -> list[float | None]:
    out: list[float | None] = [None] * len(prices)
    if len(prices) < 32:
        return out
    for i, _i1, _q1, _p, sp in _run(prices):
        if i >= 31:
            out[i] = sp
    return out


def ht_dcphase(prices: list[float]) -> list[float | None]:
    out: list[float | None] = [None] * len(prices)
    if len(prices) < 32:
        return out
    for i, i1h, q1h, _p, _sp in _run(prices):
        if i >= 31:
            ph = math.degrees(math.atan(q1h / i1h)) if i1h != 0.0 else 0.0
            ph += 90.0
            if i1h < 0.0:
                ph += 180.0
            if ph > 315.0:
                ph -= 360.0
            out[i] = ph
    return out


def ht_phasor(prices: list[float]):
    n = len(prices)
    inphase: list[float | None] = [None] * n
    quadrature: list[float | None] = [None] * n
    if n < 32:
        return inphase, quadrature
    for i, i1h, q1h, _p, _sp in _run(prices):
        if i >= 31:
            inphase[i] = i1h
            quadrature[i] = q1h
    return inphase, quadrature


def ht_sine(prices: list[float]):
    n = len(prices)
    sine: list[float | None] = [None] * n
    lead: list[float | None] = [None] * n
    if n < 32:
        return sine, lead
    for i, i1h, q1h, _p, _sp in _run(prices):
        if i >= 31:
            dc = math.degrees(math.atan(q1h / i1h)) if i1h != 0.0 else 0.0
            sine[i] = math.sin(math.radians(dc))
            lead[i] = math.sin(math.radians(dc + 45.0))
    return sine, lead


def ht_trendline(prices: list[float]) -> list[float | None]:
    out: list[float | None] = [None] * len(prices)
    if len(prices) < 32:
        return out
    for i in range(31, len(prices)):
        out[i] = sum(prices[i - j] for j in range(4)) * 0.25
    return out


def ht_trendmode(prices: list[float]) -> list[int | None]:
    out: list[int | None] = [None] * len(prices)
    if len(prices) < 32:
        return out
    for i in range(31, len(prices)):
        tl = sum(prices[i - j] for j in range(4)) * 0.25
        out[i] = 1 if abs(prices[i] - tl) > 0.01 * tl else 0
    return out
