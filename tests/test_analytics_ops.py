"""Tests: OLS vs numpy, factor kit, clean, selector, strategies, as-of join,
multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from polars_quant_spark.operators import asof, clean, factor, linear, multimodal
from polars_quant_spark.operators.selector import Selector
from polars_quant_spark.operators.strategy import STRATEGIES, ma_cross

RNG = np.random.default_rng(5)


class TestOLS:
    def test_ols_matches_numpy(self, spark):
        n = 500
        x1 = RNG.normal(0, 1, n)
        x2 = RNG.normal(0, 2, n)
        y = 3.0 + 1.5 * x1 - 0.7 * x2 + RNG.normal(0, 0.1, n)
        df = spark.createDataFrame(pd.DataFrame({"y": y, "x1": x1, "x2": x2}))
        row = linear.ols(df, "y", ["x1", "x2"]).collect()[0]
        X = np.column_stack([np.ones(n), x1, x2])
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        np.testing.assert_allclose(row["coefficients"], beta, rtol=1e-6)
        assert row["r2"] > 0.99
        assert row["n"] == n

    def test_ols_grouped(self, spark):
        n = 300
        frames = []
        for g, slope in [("a", 2.0), ("b", -1.0)]:
            x = RNG.normal(0, 1, n)
            frames.append(pd.DataFrame({"g": g, "x": x, "y": slope * x + 1.0}))
        df = spark.createDataFrame(pd.concat(frames))
        rows = {r["g"]: r for r in linear.ols(df, "y", ["x"], ["g"]).collect()}
        np.testing.assert_allclose(rows["a"]["coefficients"], [1.0, 2.0], atol=1e-9)
        np.testing.assert_allclose(rows["b"]["coefficients"], [1.0, -1.0], atol=1e-9)

    def test_residualize(self, spark):
        n = 200
        x = RNG.normal(0, 1, n)
        y = 5.0 * x + 2.0
        df = spark.createDataFrame(pd.DataFrame({"x": x, "y": y}))
        out = linear.residualize(df, "y", ["x"])
        resid = np.array([r["resid"] for r in out.collect()])
        np.testing.assert_allclose(resid, 0.0, atol=1e-8)


class TestFactor:
    @pytest.fixture(scope="class")
    def panel(self, spark):
        rows = []
        for t in range(1, 60):
            for s in range(8):
                fac = float(s) + 0.01 * t
                rows.append(("S%d" % s, t, fac, 0.1 * fac + RNG.normal(0, 0.01)))
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["symbol", "t", "factor", "fwd_ret"])
        )

    def test_ic_positive_for_predictive_factor(self, panel):
        ic_df = factor.ic(panel, "factor", "fwd_ret", "t")
        mean_ic = ic_df.agg(F.avg("ic")).collect()[0][0]
        assert mean_ic > 0.9

    def test_ir_and_rolling(self, panel):
        ic_df = factor.ic(panel, "factor", "fwd_ret", "t")
        row = factor.ir(ic_df).collect()[0]
        assert row["ir"] > 1.0
        roll = factor.rolling_ic(ic_df, 10, "t").where(F.col("rolling_ic").isNotNull())
        assert roll.count() == 59 - 9

    def test_quantile_monotone(self, panel):
        qs = {r["bucket"]: r["mean_fwd_ret"] for r in factor.quantile_sorts(panel, "factor").collect()}
        assert qs[5] > qs[1]

    def test_fama_macbeth_recovers_slope(self, panel):
        row = factor.fama_macbeth(panel, "fwd_ret", ["factor"], "t").collect()[0]
        assert abs(row["b1_mean"] - 0.1) < 0.01
        assert row["b1_tstat"] > 10


class TestClean:
    def test_winsorize_percentile(self, spark):
        vals = list(range(100))
        df = spark.createDataFrame(pd.DataFrame({"x": [float(v) for v in vals]}))
        out = clean.winsorize(df, "x", "percentile", 0.05, 0.95, out="w")
        got = sorted(r["w"] for r in out.collect())
        assert got[0] == pytest.approx(4.95)
        assert got[-1] == pytest.approx(94.05)

    def test_zscore(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"x": [1.0, 2.0, 3.0, 4.0, 5.0]}))
        got = [r["x_z"] for r in clean.zscore(df, "x").collect()]
        want = (np.arange(1, 6) - 3.0) / np.std(np.arange(1, 6), ddof=1)
        np.testing.assert_allclose(sorted(got), sorted(want), rtol=1e-9)

    def test_neutralize_industry(self, spark):
        pdf = pd.DataFrame(
            {
                "ind": ["A"] * 4 + ["B"] * 4,
                "x": [1.0, 2.0, 3.0, 4.0, 11.0, 12.0, 13.0, 14.0],
            }
        )
        df = spark.createDataFrame(pdf)
        out = clean.neutralize(df, "x", industry_col="ind", out="nx")
        by_ind = out.groupBy("ind").agg(F.avg("nx").alias("m")).collect()
        for r in by_ind:
            assert abs(r["m"]) < 1e-9  # demeaned within industry


class TestSelectorStrategy:
    @pytest.fixture(scope="class")
    def trend(self, spark):
        n = 120
        close = np.concatenate([np.linspace(100, 80, 60), np.linspace(80, 120, 60)])
        return spark.createDataFrame(
            pd.DataFrame(
                {
                    "symbol": ["X"] * n,
                    "t": np.arange(1, n + 1),
                    "close": close,
                    "high": close * 1.01,
                    "low": close * 0.99,
                    "volume": np.where(np.arange(n) == 100, 5000.0, 100.0),
                }
            )
        )

    def test_selector_screens(self, trend):
        sel = Selector(trend).price_above_ma(20).volume_surge(2.0, 20)
        rows = sel.filter().collect()
        assert len(rows) == 1 and rows[0]["t"] == 101  # the engineered spike

    def test_selector_ma_cmp_no_int64_wrap(self, spark):
        """Billion-scale volumes quantize to q ≈ 1e15 micro-units; the old
        int64 cross-multiply q·den·p wrapped past 2^63 for den·p ≥ ~1e4
        and silently corrupted the predicate (r5 advisory). The decimal
        comparison must match an exact-integer Python oracle."""
        n = 60
        vols = np.where(np.arange(n) == 50, 9.0e9, 3.0e9)  # q ≈ 9e15 spike
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "symbol": ["X"] * n,
                    "t": np.arange(1, n + 1),
                    "close": np.full(n, 100.0),
                    "high": np.full(n, 101.0),
                    "low": np.full(n, 99.0),
                    "volume": vols,
                }
            )
        )
        # volume_surge(mult=1.999, p=30): den=1000 -> den*p = 3e4, so
        # q*den*p ≈ 2.7e20 >> 2^63 — guaranteed wrap territory on int64
        rows = Selector(df).volume_surge(1.999, 30).filter().collect()
        q = [int(np.floor(v * 1e6 + 0.5)) for v in vols]
        expect = [
            t
            for t in range(30, n + 1)  # frames holding exactly 30 values
            if q[t - 1] * 1000 * 30 > sum(q[t - 30 : t]) * 1999
        ]
        assert sorted(r["t"] for r in rows) == expect
        assert expect == [51]  # only the engineered spike fires

    def test_selector_topk(self, trend):
        top = Selector(trend).price_above_ma(10).top(3, by="close").collect()
        assert len(top) == 3
        assert top[0]["close"] >= top[1]["close"] >= top[2]["close"]

    def test_selector_screen_kwargs_front_end(self, trend):
        """screen(**kw) maps the reference's filter(...) parameter names
        (README.md:683-778) onto the named screens."""
        sel = Selector(trend).screen(
            price_min=50,
            price_max=200,
            volume_min=50,
            volume_change="volume_surge",
            volume_multiplier=2.0,
        )
        rows = sel.filter().collect()
        assert len(rows) == 1 and rows[0]["t"] == 101

    def test_selector_limit_and_consecutive(self, trend):
        # the engineered series falls 60 bars then rises 60: consecutive
        # screens must fire on the respective phases only
        ups = Selector(trend).consecutive_up(3).filter().collect()
        downs = Selector(trend).consecutive_down(3).filter().collect()
        assert all(r["t"] > 60 for r in ups) and len(ups) > 0
        assert all(r["t"] <= 61 for r in downs) and len(downs) > 0
        # ±9.9% daily moves don't exist in this gentle series
        assert Selector(trend).limit("limit_up").filter().count() == 0

    def test_selector_macd_kdj_analyze(self, trend):
        # golden crosses exist around the V-bottom; death crosses near t=60
        assert Selector(trend).macd("golden_cross").filter().count() >= 1
        assert Selector(trend).kdj("oversold").filter().count() >= 1

    def test_selector_result_info_sort(self, trend):
        sel = Selector(trend).price_above_ma(20)
        assert sel.result() == ["X"]  # latest bar is in the uptrend
        info = sel.info().collect()
        assert len(info) == 1
        row = info[0]
        assert row["price"] == pytest.approx(120.0)
        assert row["return_20d"] > 0
        assert row["ma_5"] > row["ma_20"]  # uptrend ordering
        assert row["amplitude"] == pytest.approx(2.0, abs=0.1)
        srt = Selector(trend).sort(by="return_5d", top_n=1).collect()
        assert len(srt) == 1
        # reset clears screens: every symbol passes again
        assert Selector(trend).limit("limit_up").reset().result() == ["X"]

    def test_ma_cross_signals(self, spark, trend):
        from polars_quant_spark.functions import overlap as ov

        w = Window.partitionBy("symbol").orderBy("t")
        df = trend.withColumn("sma_5", ov.sma("close", 5, w)).withColumn(
            "sma_20", ov.sma("close", 20, w)
        )
        sig = ma_cross(df, w)
        buys = [r["t"] for r in sig.where("buy").collect()]
        # V-shaped price: the golden cross fires on the way back up
        assert len(buys) >= 1 and all(t > 60 for t in buys)

    def test_all_strategies_compile(self, spark, trend):
        # every generator builds a valid plan over a frame with its columns
        from polars_quant_spark.functions import overlap as ov
        from polars_quant_spark.functions import momentum as mo

        w = Window.partitionBy("symbol").orderBy("t")
        df = (
            trend.withColumn("sma_5", ov.sma("close", 5, w))
            .withColumn("sma_20", ov.sma("close", 20, w))
            .withColumn("mom_10", mo.mom("close", 10, w))
        )
        for name in ["ma_cross", "momentum_follow", "channel_breakout", "volume_price_surge"]:
            out = STRATEGIES[name](df, w)
            assert out.select("buy", "sell").count() == 120


class TestAsofMultimodal:
    def test_asof_backward(self, spark):
        left = spark.createDataFrame(
            pd.DataFrame({"k": ["a"] * 3, "ts": [5, 10, 15], "lv": [1, 2, 3]})
        )
        right = spark.createDataFrame(
            pd.DataFrame({"k": ["a"] * 3, "ts": [4, 10, 14], "rv": [100, 200, 300]})
        )
        out = {r["ts"]: (r["r_rv"], r["r_ts"]) for r in asof.asof_join(left, right, "ts", "k").collect()}
        assert out[5] == (100, 4)
        assert out[10] == (200, 10)  # exact timestamp matches
        assert out[15] == (300, 14)

    def test_asof_forward(self, spark):
        left = spark.createDataFrame(
            pd.DataFrame({"k": ["a"] * 3, "ts": [5, 10, 15], "lv": [1, 2, 3]})
        )
        right = spark.createDataFrame(
            pd.DataFrame({"k": ["a"] * 3, "ts": [4, 10, 14], "rv": [100, 200, 300]})
        )
        out = {
            r["ts"]: (r["r_rv"], r["r_ts"])
            for r in asof.asof_join(
                left, right, "ts", "k", direction="forward"
            ).collect()
        }
        assert out[5] == (200, 10)   # earliest at-or-after
        assert out[10] == (200, 10)  # exact timestamp matches
        assert out[15] == (None, None)  # nothing after

    def test_asof_tolerance(self, spark):
        left = spark.createDataFrame(pd.DataFrame({"k": ["a"], "ts": [100], "lv": [1]}))
        right = spark.createDataFrame(pd.DataFrame({"k": ["a"], "ts": [10], "rv": [7]}))
        out = asof.asof_join(left, right, "ts", "k", tolerance=50).collect()[0]
        assert out["r_rv"] is None  # match outside tolerance nulled

    def test_multimodal_features(self, spark):
        media = multimodal.synthetic_media(spark, 30)
        feats = multimodal.extract_features(media).collect()
        assert len(feats) == 30
        meta = {r["media_id"]: r for r in media.collect()}
        for r in feats:
            assert len(r["features"]) == 8
            f, m = r["features"], meta[r["media_id"]]
            if r["kind"] == "image":  # REAL PPM decode: [w, h, means…]
                assert (f[0], f[1]) == (m["width"], m["height"])
                assert all(0 <= v <= 1 for v in f[2:])
            elif r["kind"] == "audio":  # REAL WAV decode: duration matches
                assert abs(f[2] * 1000 - m["duration_ms"]) < 1
                assert 0.3 < f[3] < 0.4  # RMS of a 0.5-amplitude sine ≈ 0.354
            else:  # stub path (no pure-python video codec)
                assert all(0 <= v <= 1 for v in f)
        # deterministic: same id → same digest across runs
        again = {r["media_id"]: r["payload_digest"] for r in multimodal.extract_features(media).collect()}
        for r in feats:
            assert again[r["media_id"]] == r["payload_digest"]

    def test_ppm_decoder_exact(self):
        # 2×1 image, known bytes: left pixel (0,0,0), right (255, 255, 0)
        payload = b"P6\n# c\n2 1\n255\n" + bytes([0, 0, 0, 255, 255, 0])
        f = multimodal.decode_ppm(payload)
        assert f[:2] == [2.0, 1.0]
        assert f[2:5] == [0.5, 0.5, 0.0]  # channel means
        assert f[6] == 0.0 and f[7] == 1.0  # min / max

    def test_resize_ppm_header_layouts(self):
        # _resize_ppm must accept any spec-valid P6 header, not just the
        # synthetic generator's one-comment layout (ADVICE r2).
        px = bytes([0, 0, 0, 255, 255, 0, 10, 20, 30, 40, 50, 60])
        variants = [
            b"P6\n2 2\n255\n" + px,  # no comment
            b"P6 2 2 255\n" + px,  # one-line header
            b"P6\n# a\n# b\n2\n# c\n2\n255\n" + px,  # many comments
            b"P6\n# w h maxval\n2 2 255\n" + px,  # comment + one-line
        ]
        outs = {multimodal._resize_ppm(v, 2, 2) for v in variants}
        assert len(outs) == 1  # identical pixels → identical canonical bytes
        out = outs.pop()
        assert out.startswith(b"P6\n2 2\n255\n")
        assert multimodal.decode_ppm(out)[:2] == [2.0, 2.0]
        # 1×1 downsample picks the top-left pixel
        tiny = multimodal._resize_ppm(variants[0], 1, 1)
        assert tiny == b"P6\n1 1\n255\n" + bytes([0, 0, 0])

    def test_wav_decoder_exact(self):
        payload = multimodal._make_wav(3, ms=500, rate=8000)
        f = multimodal.decode_wav(payload)
        assert f[0] == 1.0  # mono
        assert abs(f[2] - 0.5) < 1e-9  # 500 ms
        assert abs(f[3] - 0.5 / 2**0.5) < 0.01  # sine RMS = a/√2
        assert abs(f[6]) < 0.01  # zero-mean

    def test_frame_sample_plan(self, spark):
        media = multimodal.synthetic_media(spark, 30)
        frames = multimodal.frame_sample_plan(media, every_ms=1000)
        agg = frames.groupBy("media_id").count().collect()
        assert len(agg) == 10  # a third of the corpus is video
        for r in agg:
            assert r["count"] >= 1


def test_subsample_and_subgroup_ic(spark):
    rows = []
    rng = np.random.default_rng(8)
    for t in range(1, 41):
        for s in range(6):
            fac = float(s) + 0.01 * t
            rows.append(("S%d" % s, t, fac, 0.1 * fac + rng.normal(0, 0.01)))
    panel = spark.createDataFrame(
        pd.DataFrame(rows, columns=["symbol", "t", "factor", "fwd_ret"])
    )
    ic_df = factor.ic(panel, "factor", "fwd_ret", "t")
    sub = factor.subsample_ic(ic_df, "t", 2).collect()
    assert len(sub) == 2
    for r in sub:
        assert r["ic_mean"] > 0.9  # robust across halves
    groups = factor.subgroup_ic(panel, "factor", "fwd_ret", "symbol", "t").collect()
    assert len(groups) == 6


def test_quantized_two_level_sum_matches_decimal(spark):
    """Guard the integer-domain sum discipline (queries.micros/units/
    merge_micros): the two-level long-partials + decimal-merge shape must
    equal a plain DECIMAL(38,6) sum of the same quantized values, for any
    partitioning of the input."""
    from polars_quant_spark.queries import merge_micros, micros, units

    rng = np.random.default_rng(11)
    pdf = pd.DataFrame(
        {
            "g": rng.integers(0, 4, 5000).astype(str),
            "x": np.round(rng.normal(1000.0, 700.0, 5000), 4),  # incl. negatives
        }
    )
    df = spark.createDataFrame(pdf).repartition(7)
    two_level = (
        df.groupBy("g", F.spark_partition_id().alias("_p"))
        .agg(F.sum(micros(F.col("x"))).alias("_s"))
        .groupBy("g")
        .agg(units(merge_micros(F.col("_s"))).alias("s"))
    )
    reference = df.groupBy("g").agg(
        (
            F.sum((micros(F.col("x")) / F.lit(1000000.0)).cast("decimal(38,6)"))
            .cast("double")
        ).alias("s")
    )
    got = {r["g"]: r["s"] for r in two_level.collect()}
    want = {r["g"]: r["s"] for r in reference.collect()}
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


class TestSaltedJoin:
    def _skewed(self, spark):
        rng = np.random.default_rng(3)
        # 10k rows, 80% on one hot key
        keys = np.where(rng.random(10_000) < 0.8, 7, rng.integers(0, 50, 10_000))
        big = spark.createDataFrame(
            pd.DataFrame({"k": keys, "v": rng.normal(size=10_000)})
        )
        small = spark.createDataFrame(
            pd.DataFrame({"k": np.arange(50), "name": [f"n{i}" for i in range(50)]})
        )
        return big, small

    def test_matches_plain_inner_join(self, spark):
        from polars_quant_spark.operators.skew import salted_join

        big, small = self._skewed(spark)
        got = salted_join(big, small, "k", salt=8).groupBy("k", "name").count()
        want = big.join(small, "k").groupBy("k", "name").count()
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    def test_left_keeps_unmatched_big_rows(self, spark):
        from polars_quant_spark.operators.skew import salted_join

        big, small = self._skewed(spark)
        small_missing_hot = small.where(F.col("k") != 7)
        got = salted_join(big, small_missing_hot, "k", salt=8, how="left")
        assert got.count() == big.count()
        assert got.where(F.col("k") == 7).where(F.col("name").isNotNull()).count() == 0

    def test_salt_spreads_hot_key(self, spark):
        from polars_quant_spark.operators.skew import _SALT, salted_join  # noqa: F401

        big, small = self._skewed(spark)
        # inspect the pre-drop salted frame: the hot key must occupy >1 salt
        b = big.withColumn(
            "s", F.pmod(F.xxhash64(F.col("v")), F.lit(8)).cast("int")
        )
        n_salts = b.where(F.col("k") == 7).select("s").distinct().count()
        assert n_salts == 8

    def test_rejects_outer(self, spark):
        from polars_quant_spark.operators.skew import salted_join

        big, small = self._skewed(spark)
        with pytest.raises(ValueError):
            salted_join(big, small, "k", how="outer")


class TestChunkedWindows:
    """Halo-chunked window evaluation must be bit-identical to the plain
    per-symbol window (operators/chunked.py exactness contract)."""

    def _builders(self):
        from polars_quant_spark.functions import momentum as mo
        from polars_quant_spark.functions import overlap as ov

        return {
            "sma_20": lambda w: ov.sma("close", 20, w),
            "wma_10": lambda w: ov.wma("close", 10, w),
            "mom_10": lambda w: mo.mom("close", 10, w),
            "cmo_14": lambda w: mo.cmo("close", 14, w),
        }

    @pytest.mark.parametrize("chunk", [97, 128])  # 97: misaligned boundaries
    def test_matches_plain_window(self, spark, sf_dir, chunk):
        from pyspark.sql import Window

        from polars_quant_spark.operators.chunked import with_chunked_windows
        from polars_quant_spark.sources.bars import bars

        b = bars(spark, sf_dir)
        builders = self._builders()
        # chunk≈100 → ~15 boundaries per symbol at sf0.001
        chunked = with_chunked_windows(b, builders, lookback=19, chunk=chunk)
        w = Window.partitionBy("symbol").orderBy("t")
        plain = b.select(
            "symbol", "t", *[fn(w).alias(name) for name, fn in builders.items()]
        )
        cols = ["symbol", "t", *builders]
        a = [tuple(r) for r in chunked.select(*cols).orderBy("symbol", "t").collect()]
        e = [tuple(r) for r in plain.orderBy("symbol", "t").collect()]
        assert a == e

    def test_rejects_chunk_below_lookback(self, spark, sf_dir):
        import pytest

        from polars_quant_spark.operators.chunked import with_chunked_windows
        from polars_quant_spark.sources.bars import bars

        with pytest.raises(ValueError):
            with_chunked_windows(
                bars(spark, sf_dir), self._builders(), lookback=64, chunk=64
            )

    def test_chunked_cumsum_matches_plain(self, spark, sf_dir):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from polars_quant_spark.functions import volume as vu
        from polars_quant_spark.functions._util import round6
        from polars_quant_spark.operators.chunked import chunked_cumsum
        from polars_quant_spark.sources.bars import bars

        b = bars(spark, sf_dir)

        def adc(w):
            return round6(vu.clv_flow("high", "low", "close", "volume")).cast(
                "decimal(38,6)"
            )

        def obvc(w):
            return round6(vu.obv_flow("close", "volume", w)).cast("decimal(38,6)")

        ch = chunked_cumsum(b, {"ad": adc, "obv": obvc}, lookback=1, chunk=128)
        w = Window.partitionBy("symbol").orderBy("t")
        plain = b.select(
            "symbol",
            "t",
            vu.ad("high", "low", "close", "volume", w, exact=True).alias("ad"),
            vu.obv("close", "volume", w, exact=True).alias("obv"),
        )
        a = [
            tuple(r)
            for r in ch.select("symbol", "t", "ad", "obv").orderBy("symbol", "t").collect()
        ]
        e = [tuple(r) for r in plain.orderBy("symbol", "t").collect()]
        assert a == e


def test_min_variance_weights(spark, sf_dir):
    """Weights sum to 1, match the closed-form numpy solve on the same
    covariance, and the minimum-variance portfolio has variance <= any
    single asset's."""
    import numpy as np

    from polars_quant_spark.operators.portfolio import min_variance_weights
    from polars_quant_spark.queries import QUERIES

    cov_df = QUERIES["bars_return_cov"](spark, sf_dir)
    out = {r["symbol"]: r["weight"] for r in
           min_variance_weights(spark, cov_df).collect()}
    assert abs(sum(out.values()) - 1.0) < 1e-9
    rows = cov_df.collect()
    syms = sorted(out)
    idx = {s: i for i, s in enumerate(syms)}
    S = np.zeros((len(syms), len(syms)))
    for r in rows:
        i, j = idx[r["sym_a"]], idx[r["sym_b"]]
        S[i, j] = S[j, i] = r["cov"]
    S += 1e-9 * np.eye(len(syms))
    wref = np.linalg.solve(S, np.ones(len(syms)))
    wref /= wref.sum()
    got = np.array([out[s] for s in syms])
    assert np.abs(got - wref).max() < 1e-9
    assert got @ S @ got <= min(np.diag(S)) + 1e-12


def test_interpolate_linear_hand_case(spark):
    """Interior NULL run interpolates time-weighted; leading run backfills;
    trailing run forward-fills; observations pass through untouched."""
    import pandas as pd

    from polars_quant_spark.operators.clean import interpolate_linear

    pdf = pd.DataFrame(
        {
            "symbol": ["a"] * 6,
            "ts_us": [0, 10, 30, 40, 50, 70],
            "close": [None, 2.0, None, None, 8.0, None],
        }
    )
    out = (
        interpolate_linear(spark.createDataFrame(pdf), "close", out="i")
        .orderBy("ts_us")
        .collect()
    )
    got = [r["i"] for r in out]
    # t=30: 2 + (8-2)*(30-10)/(50-10) = 5.0 ; t=40: 2 + 6*(30/40) = 6.5
    assert got == [2.0, 2.0, 5.0, 6.5, 8.0, 8.0]


def test_interpolate_linear_single_exchange(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from polars_quant_spark.operators.clean import interpolate_linear

    pdf = pd.DataFrame(
        {"symbol": ["a", "b"] * 10, "ts_us": list(range(20)), "close": [1.0, None] * 10}
    )
    df = interpolate_linear(spark.createDataFrame(pdf), "close")
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    import re

    assert len(re.findall(r"\(\d+\) Exchange", buf.getvalue())) == 1


class TestPngCodec:
    def test_round_trip_exact(self):
        rng = np.random.default_rng(5)
        for shape in [(7, 9, 3), (16, 16, 4), (5, 3, 1)]:
            px = rng.integers(0, 256, size=shape, dtype=np.uint8)
            out = multimodal._png_pixels(multimodal._png_encode(px))
            assert (out == px).all()

    def test_unfilters_all_filter_types(self):
        # hand-build a PNG whose scanlines use filters 0..4 and check the
        # decoder inverts each against a straight-forward reference filterer
        import struct
        import zlib

        rng = np.random.default_rng(11)
        w, h, ch = 6, 5, 3
        px = rng.integers(0, 256, size=(h, w * ch), dtype=np.int32)

        def filt(y, ft):
            prev = px[y - 1] if y > 0 else np.zeros(w * ch, dtype=np.int32)
            cur = px[y]
            out = np.zeros(w * ch, dtype=np.int32)
            for i in range(w * ch):
                a = int(cur[i - ch]) if i >= ch else 0
                b = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                if ft == 0:
                    out[i] = cur[i]
                elif ft == 1:
                    out[i] = cur[i] - a
                elif ft == 2:
                    out[i] = cur[i] - b
                elif ft == 3:
                    out[i] = cur[i] - ((a + b) >> 1)
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    out[i] = cur[i] - pred
            return (out & 255).astype(np.uint8)

        raw = b"".join(
            bytes([y % 5]) + filt(y, y % 5).tobytes() for y in range(h)
        )

        def chunk(tag, data):
            return (
                struct.pack(">I", len(data))
                + tag
                + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )

        payload = (
            multimodal._PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )
        out = multimodal._png_pixels(payload)
        assert (out.reshape(h, w * ch) == px.astype(np.uint8)).all()

    def test_decode_png_features_and_dispatch(self):
        px = np.zeros((4, 4, 3), dtype=np.uint8)
        px[:, :, 0] = 255  # pure red
        payload = multimodal._png_encode(px)
        f = multimodal.decode_png(payload)
        assert f[:5] == [4.0, 4.0, 1.0, 0.0, 0.0]
        assert multimodal._decode(payload, "image") == f  # magic dispatch

    def test_rejects_unsupported(self):
        import struct
        import zlib as _z

        with pytest.raises(ValueError, match="not a PNG"):
            multimodal._png_pixels(b"nope")
        # 16-bit depth rejected rather than mis-decoded
        def chunk(tag, data):
            return (
                struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", _z.crc32(tag + data) & 0xFFFFFFFF)
            )
        bad = (
            multimodal._PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
            + chunk(b"IDAT", _z.compress(b"\x00" * 26))
            + chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="unsupported"):
            multimodal._png_pixels(bad)


class TestJpegCodec:
    def test_block_constant_round_trip_bit_exact(self):
        # flat quant table + 8×8-block-constant input → DC-only integer DCT
        # → the encode→Huffman→decode→IDCT loop must reproduce every pixel
        # (the property media_jpeg_features hashes against its closed form)
        for i in (0, 3, 7, 11):
            img = multimodal._make_jpeg_blocks(i)
            out = multimodal._jpeg_pixels(multimodal._jpeg_encode(img))
            assert out.shape == (*img.shape, 1)
            assert (out[:, :, 0] == img).all()

    def test_odd_dimensions_pad_and_crop(self):
        img = multimodal._make_jpeg_blocks(2)[:50, :70]  # non-multiple of 8
        out = multimodal._jpeg_pixels(multimodal._jpeg_encode(img))
        assert out.shape == (50, 70, 1)
        assert (out[:, :, 0] == img).all()

    def test_lossy_std_table_bounded_error(self):
        # the standard Annex K table exercises the AC run/size + ZRL path;
        # baseline JPEG at this quality stays within a small pixel error
        rng = np.random.default_rng(7)
        grad = np.add.outer(np.arange(64) * 2, np.arange(96)) % 256
        img = np.clip(grad + rng.integers(0, 8, (64, 96)), 0, 255).astype(np.uint8)
        enc = multimodal._jpeg_encode(img, multimodal._JPEG_QTBL_STD)
        dec = multimodal._jpeg_pixels(enc)[:, :, 0].astype(int)
        err = np.abs(dec - img.astype(int))
        assert err.max() <= 32 and err.mean() < 4

    def test_features_and_dispatch(self):
        img = np.full((16, 16), 255, dtype=np.uint8)
        payload = multimodal._jpeg_encode(img)
        f = multimodal.decode_jpeg(payload)
        assert f[:2] == [16.0, 16.0]
        assert all(abs(v - 1.0) < 1e-9 for v in f[2:5])  # pure white
        assert multimodal._decode(payload, "image") == f  # magic dispatch

    def test_rejects_unsupported(self):
        with pytest.raises(ValueError, match="not a JPEG"):
            multimodal._jpeg_pixels(b"nope")
        # progressive (SOF2) rejected rather than mis-decoded
        import struct as _s

        prog = (
            multimodal._JPEG_SOI
            + _s.pack(">BBH", 0xFF, 0xC2, 8)
            + b"\x08\x00\x08\x00\x08\x01"
        )
        with pytest.raises(ValueError, match="progressive"):
            multimodal._jpeg_pixels(prog)


class TestMp4Container:
    def test_box_walk_recovers_generator_fields(self):
        for i in (0, 1, 6, 13):
            m = multimodal.parse_mp4(multimodal._make_mp4(i))
            assert m["timescale"] == 1000
            assert m["duration"] == (i % 30 + 1) * 100
            assert m["n_tracks"] == 1 + (i % 2)
            assert m["max_w"] == 160 + (i % 4) * 80
            assert m["max_h"] == 120 + (i % 3) * 60
            assert m["mdat_bytes"] == 256 + (i % 7) * 64
            assert m["n_boxes"] == 4 + 2 * m["n_tracks"]
            assert m["max_depth"] == 3

    def test_largesize_and_version1_headers(self):
        import struct as _s

        # 64-bit largesize mdat + version-1 mvhd must parse identically
        ts, dur = 90_000, 450_000
        mvhd_v1 = multimodal._mp4_box(
            b"mvhd",
            b"\x01\x00\x00\x00" + _s.pack(">QQIQ", 0, 0, ts, dur) + b"\x00" * 80,
        )
        moov = multimodal._mp4_box(b"moov", mvhd_v1)
        body = b"x" * 32
        large_mdat = (
            _s.pack(">I", 1) + b"mdat" + _s.pack(">Q", 16 + len(body)) + body
        )
        ftyp = multimodal._mp4_box(b"ftyp", b"isom" + _s.pack(">I", 512))
        m = multimodal.parse_mp4(ftyp + moov + large_mdat)
        assert (m["timescale"], m["duration"]) == (ts, dur)
        assert m["mdat_bytes"] == len(body)

    def test_features_and_dispatch(self):
        p = multimodal._make_mp4(5)
        f = multimodal.decode_mp4(p)
        assert f[0] == (5 % 30 + 1) * 100 / 1000.0  # duration seconds
        assert multimodal._decode(p, "video") == f  # ftyp dispatch

    def test_rejects_non_bmff_and_malformed(self):
        with pytest.raises(ValueError, match="not an ISO-BMFF"):
            multimodal.parse_mp4(b"garbage that is not mp4")
        import struct as _s

        # truncated box (declared size past EOF) must raise, not mis-parse
        bad = multimodal._mp4_box(b"ftyp", b"isom" + _s.pack(">I", 512))
        bad += _s.pack(">I", 4096) + b"moov" + b"\x00" * 8
        with pytest.raises(ValueError, match="malformed"):
            multimodal.parse_mp4(bad)


class TestMp3Frames:
    def test_frame_walk_recovers_generator_fields(self):
        for i in (0, 1, 7, 14, 23):
            m = multimodal.parse_mp3(multimodal._make_mp3(i))
            kbps = [64, 128, 192, 256][i % 4]
            sr = [44100, 48000, 32000][i % 3]
            nf = 10 + (i % 5) * 5
            assert (m["bitrate_kbps"], m["samplerate"], m["n_frames"]) == (
                kbps,
                sr,
                nf,
            )
            assert m["total_samples"] == nf * 1152
            assert m["stream_bytes"] == nf * (144_000 * kbps // sr)
            assert m["id3_bytes"] == (10 + 16 * (2 + i % 3) if i % 2 else 0)

    def test_padding_bit_lengthens_frame(self):
        # hand-build one padded frame: length formula must add the byte
        hdr = bytes([0xFF, 0xFB, (9 << 4) | (0 << 2) | (1 << 1), 0x00])
        flen = 144_000 * 128 // 44100 + 1
        m = multimodal.parse_mp3(hdr + b"\x00" * (flen - 4))
        assert m["n_frames"] == 1 and m["stream_bytes"] == flen

    def test_features_and_dispatch(self):
        p = multimodal._make_mp3(4)
        f = multimodal.decode_mp3(p)
        assert multimodal._decode(p, "audio") == f  # sync-byte dispatch
        # odd id → ID3 envelope → the ID3 dispatch arm
        p2 = multimodal._make_mp3(5)
        assert multimodal._decode(p2, "audio") == multimodal.decode_mp3(p2)

    def test_rejects_broken_streams(self):
        with pytest.raises(ValueError, match="no MP3 frames"):
            multimodal.parse_mp3(b"ID3\x04\x00\x00\x00\x00\x00\x00")
        with pytest.raises(ValueError, match="truncated"):
            multimodal.parse_mp3(bytes([0xFF, 0xFB, 9 << 4, 0]) + b"\x00" * 10)
        with pytest.raises(ValueError, match="free-format"):
            multimodal.parse_mp3(bytes([0xFF, 0xFB, 0xF0, 0]) + b"\x00" * 100)
