"""Differential suite for the event-driven backtest fold (VERDICT r11 #4).

``_fold_state`` (event-driven, numpy segment scans between signal events)
must be BIT-EQUAL to ``_fold_state_loop`` (the per-bar Python loop kept as
the executable spec of vectorized.rs:124-194) — per-bar outputs AND the
carried FoldState, across every parameter regime: slippage/commission,
stop-loss, take-profit, trailing stop (which gates on the per-bar hwm),
NaN/≤0 price freezes, and resume-from-state across arbitrary cuts.

Scenario arrays are seeded-numpy (not hypothesis-drawn lists — see the
repo's hypothesis discipline): dense/sparse signal mixes at several sizes.
"""

from __future__ import annotations

from math import isnan

import numpy as np
import pytest

from polars_quant_spark.backtest.vectorized import (
    BacktestParams,
    _fold_state,
    _fold_state_loop,
)

PARAM_GRID = [
    BacktestParams(),
    BacktestParams(buy_slippage=0.02, sell_slippage=0.03),
    BacktestParams(buy_commission_rate=1e-3, sell_commission_rate=2e-3,
                   min_commission=20.0),
    BacktestParams(position_size=0.35),
    BacktestParams(stop_loss=0.04),
    BacktestParams(take_profit=0.05),
    BacktestParams(trailing_stop=0.03),
    BacktestParams(stop_loss=0.06, take_profit=0.04, trailing_stop=0.05,
                   buy_slippage=0.01, sell_slippage=0.01),
]


def _scenario(seed: int, n: int, buy_p: float, sell_p: float,
              bad_p: float = 0.05):
    rng = np.random.default_rng(seed)
    steps = rng.normal(0.0, 0.02, n)
    price = 100.0 * np.exp(np.cumsum(steps))
    bad = rng.random(n) < bad_p
    kind = rng.random(n)
    price = np.where(bad & (kind < 0.5), np.nan, price)
    price = np.where(bad & (kind >= 0.5), rng.choice([0.0, -3.0]), price)
    buy = rng.random(n) < buy_p
    sell = rng.random(n) < sell_p
    return price, buy, sell


def _state_eq(a, b):
    assert len(a) == len(b) == 9
    for x, y in zip(a, b):
        if isinstance(x, float) and isnan(x):
            assert isinstance(y, float) and isnan(y)
        else:
            assert x == y, (a, b)


def _assert_same(price, buy, sell, p, state=None):
    want = _fold_state_loop(price, buy, sell, p, state)
    got = _fold_state(price, buy, sell, p, state)
    for k in range(4):
        assert np.array_equal(want[k], got[k], equal_nan=True), (
            k, np.flatnonzero(want[k] != got[k])[:5],
        )
    _state_eq(want[4], got[4])


@pytest.mark.parametrize("p", PARAM_GRID)
@pytest.mark.parametrize(
    "seed,n,bp,sp",
    [
        (1, 500, 0.05, 0.05),
        (2, 500, 0.4, 0.4),     # dense signals: event path ~ per-bar
        (3, 2000, 0.005, 0.005),  # sparse: long closed-form stretches
        (4, 40000, 0.0005, 0.0005),  # crosses _EVENT_BLOCK boundaries
        (5, 300, 0.3, 0.0),     # buys never matched by sells
        (6, 300, 0.0, 0.3),     # sells with no position
    ],
)
def test_bit_equal_fresh(p, seed, n, bp, sp):
    price, buy, sell = _scenario(seed, n, bp, sp)
    _assert_same(price, buy, sell, p)


@pytest.mark.parametrize("p", PARAM_GRID)
def test_bit_equal_resume_chain(p):
    """Chained segment folds (the backtest_segmented contract) must equal
    one whole-array fold, with the event kernel on BOTH sides of the cut
    and the carried state compared at every boundary."""
    price, buy, sell = _scenario(7, 3000, 0.02, 0.02)
    want_pos, want_cash, want_eq, want_dd, want_st = _fold_state_loop(
        price, buy, sell, p
    )
    cuts = [0, 211, 1024, 1025, 2999, 3000]
    st = None
    outs = []
    ref_st = None
    for lo, hi in zip(cuts[:-1], cuts[1:]):
        seg = _fold_state(price[lo:hi], buy[lo:hi], sell[lo:hi], p, st)
        # loop-spec state at the same boundary
        ref = _fold_state_loop(price[lo:hi], buy[lo:hi], sell[lo:hi], p, ref_st)
        _state_eq(ref[4], seg[4])
        outs.append(seg[:4])
        st, ref_st = seg[4], ref[4]
    got = [np.concatenate([o[k] for o in outs]) for k in range(4)]
    for k, want in enumerate((want_pos, want_cash, want_eq, want_dd)):
        assert np.array_equal(want, got[k], equal_nan=True)
    _state_eq(want_st, st)


def test_edges():
    p = BacktestParams(trailing_stop=0.02, stop_loss=0.05)
    empty = np.array([], dtype="float64")
    eb = np.array([], dtype="bool")
    _assert_same(empty, eb, eb, p)
    # all-frozen array
    n = 50
    _assert_same(np.full(n, np.nan), np.ones(n, bool), np.ones(n, bool), p)
    # buy on the very first bar, sell on the last, simultaneous signals
    price = np.linspace(10, 20, n)
    buy = np.zeros(n, bool)
    sell = np.zeros(n, bool)
    buy[0] = True
    sell[-1] = True
    buy[25] = sell[25] = True
    _assert_same(price, buy, sell, p)
    # buy bar whose fill can't afford min_commission -> failed purchase
    tiny = BacktestParams(initial_capital=3.0, min_commission=5.0)
    _assert_same(price, buy, sell, tiny)
    # negative fill guard: price + big negative slippage
    neg = BacktestParams(buy_slippage=-100.0)
    _assert_same(price, buy, sell, neg)


def test_nonfinite_prices_frozen():
    """±inf prices are FROZEN bars in both kernels (ADVICE r12): +inf used
    to pass the isnan/<=0 check, making pos=0 equity 0.0*inf = NaN, after
    which the loop's max(peak, nan) and the event kernel's
    np.maximum.accumulate diverge. Now inf freezes like NaN — outputs stay
    finite and the kernels stay bit-equal."""
    n = 200
    rng = np.random.default_rng(13)
    price = 100.0 * np.exp(np.cumsum(rng.normal(0.0, 0.02, n)))
    inf_at = rng.choice(n, 20, replace=False)
    price[inf_at[:10]] = np.inf
    price[inf_at[10:]] = -np.inf
    buy = rng.random(n) < 0.2
    sell = rng.random(n) < 0.2
    for p in PARAM_GRID:
        _assert_same(price, buy, sell, p)
        got = _fold_state(price, buy, sell, p)
        for k in range(4):
            assert np.all(np.isfinite(got[k])), k
    # flat (pos=0) across an inf bar: the exact NaN-equity repro
    price2 = np.array([10.0, np.inf, 11.0, 12.0])
    nb = np.zeros(4, bool)
    _assert_same(price2, nb, nb, BacktestParams())
    got = _fold_state(price2, nb, nb, BacktestParams())
    assert np.all(np.isfinite(got[2]))  # equity has no NaN
    # all-inf array (degenerate: everything frozen)
    _assert_same(np.full(8, np.inf), np.ones(8, bool), np.ones(8, bool),
                 BacktestParams(trailing_stop=0.02))


def test_bit_equal_random_sweep():
    """Broad seeded sweep: 200 random (params, scenario) combos at small n
    — catches edge interactions the parametrized grid misses (frozen runs
    at array edges, stop thresholds landing exactly on bars, zero-capital
    starts, resume cuts inside positions)."""
    rng = np.random.default_rng(99)
    for trial in range(200):
        n = int(rng.integers(1, 400))
        price, buy, sell = _scenario(
            int(rng.integers(0, 2**31)), n,
            float(rng.uniform(0, 0.5)), float(rng.uniform(0, 0.5)),
            bad_p=float(rng.uniform(0, 0.4)),
        )
        p = BacktestParams(
            initial_capital=float(rng.choice([0.0, 3.0, 1e5])),
            buy_slippage=float(rng.uniform(-0.5, 2.0)),
            sell_slippage=float(rng.uniform(-0.5, 2.0)),
            min_commission=float(rng.choice([0.0, 5.0, 500.0])),
            position_size=float(rng.uniform(0.05, 1.0)),
            stop_loss=None if rng.random() < 0.5 else float(rng.uniform(0.001, 0.2)),
            take_profit=None if rng.random() < 0.5 else float(rng.uniform(0.001, 0.2)),
            trailing_stop=None if rng.random() < 0.5 else float(rng.uniform(0.001, 0.2)),
        )
        _assert_same(price, buy, sell, p)
        # resume across a random cut, event kernel both sides
        cut = int(rng.integers(0, n + 1))
        a = _fold_state(price[:cut], buy[:cut], sell[:cut], p)
        b = _fold_state(price[cut:], buy[cut:], sell[cut:], p, a[4])
        whole = _fold_state_loop(price, buy, sell, p)
        for k in range(4):
            got = np.concatenate([a[k], b[k]])
            assert np.array_equal(whole[k], got, equal_nan=True), (trial, k, cut)
        _state_eq(whole[4], b[4])
