"""Vectorized backtester — per-symbol ordered fold, all symbols in one Spark
job.

Semantics of /root/reference/src/backtest/vectorized.rs:119-194 (SURVEY §2.6):
long-only single-asset signal replay —

* buy when ``buy && position == 0``: all-in at ``price + buy_slippage``,
  ``shares = floor(cash * position_size / fill_price)``; commission =
  ``max(rate * notional, min_commission)`` (vectorized.rs:154-155);
* sell when ``sell && position > 0``: everything at ``price − sell_slippage``,
  same commission rule; a win when net proceeds exceed the entry cost;
* NaN or ≤0 price rows freeze state (vectorized.rs:141-144);
* equity = cash + position·price, tracked with running peak and drawdown.

The reference runs one asset per call and (v0.x) a thread pool ≥4 assets
(README.md:402-407); here the fold is a numpy-backed kernel inside the
recurrence runner's ``applyInPandas`` — one shuffle on symbol, every symbol
folds in parallel across executors, linear in bars.
"""

from __future__ import annotations

from dataclasses import dataclass
from math import floor, isnan

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType


@dataclass
class BacktestParams:
    """Constructor knobs of vectorized.rs:37-66 / .pyi:20-49."""

    initial_capital: float = 100_000.0
    buy_slippage: float = 0.0
    sell_slippage: float = 0.0
    buy_commission_rate: float = 3e-4
    sell_commission_rate: float = 3e-4
    min_commission: float = 5.0
    position_size: float = 1.0
    # Risk exits beyond the reference surface (README.md:350-366 sketches a
    # richer v0.x Backtest; the snapshot has neither): fractional drawdown /
    # run-up from the ENTRY FILL price that forces an exit at that bar's
    # close. None disables. Evaluated before signals: an exit fires even on
    # a buy-signal bar.
    stop_loss: float | None = None
    take_profit: float | None = None
    # trailing stop: fractional drawdown from the highest price seen SINCE
    # ENTRY (the entry fill seeds the high-water mark) that forces an exit
    # at that bar's close. Composable with stop_loss/take_profit.
    trailing_stop: float | None = None


def _fold(
    price: np.ndarray,
    buy: np.ndarray,
    sell: np.ndarray,
    p: BacktestParams,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, int, int]:
    """The sequential fold of vectorized.rs:124-194. Returns per-bar
    (position, cash, equity, drawdown) plus (n_trades, n_wins)."""
    n = price.shape[0]
    position = np.zeros(n)
    cash_arr = np.zeros(n)
    equity_arr = np.zeros(n)
    dd_arr = np.zeros(n)

    pos = 0.0
    cash = p.initial_capital
    peak = p.initial_capital
    entry_cost = 0.0
    entry_px = 0.0
    last_price = float("nan")
    trades = 0
    wins = 0
    # multipliers precomputed ONCE so the boundary compare uses the same
    # double the SQL twin inlines (1-sl recomputed per bar could differ by
    # an ulp from a literal)
    sl_mult = None if p.stop_loss is None else 1.0 - p.stop_loss
    tp_mult = None if p.take_profit is None else 1.0 + p.take_profit
    ts_mult = None if p.trailing_stop is None else 1.0 - p.trailing_stop
    hwm = 0.0

    for i in range(n):
        px = price[i]
        frozen = isnan(px) or px <= 0.0
        if not frozen:
            last_price = px
            if pos > 0.0 and px > hwm:
                hwm = px
            exit_now = pos > 0.0 and (
                sell[i]
                or (sl_mult is not None and px <= entry_px * sl_mult)
                or (tp_mult is not None and px >= entry_px * tp_mult)
                or (ts_mult is not None and px <= hwm * ts_mult)
            )
            if exit_now:
                fill = px - p.sell_slippage
                proceeds = pos * fill
                fee = max(p.sell_commission_rate * proceeds, p.min_commission)
                cash += proceeds - fee
                trades += 1
                if proceeds - fee > entry_cost:
                    wins += 1
                pos = 0.0
                entry_cost = 0.0
                entry_px = 0.0
                hwm = 0.0
            elif buy[i] and pos == 0.0:
                fill = px + p.buy_slippage
                if fill > 0:
                    shares = floor(cash * p.position_size / fill)
                    # downsize until the commission also fits in cash
                    while shares > 0:
                        notional = shares * fill
                        fee = max(p.buy_commission_rate * notional, p.min_commission)
                        if notional + fee <= cash:
                            break
                        shares -= 1
                    if shares > 0:
                        cash -= notional + fee
                        pos = float(shares)
                        entry_cost = notional + fee
                        entry_px = fill
                        hwm = fill
        mark = last_price if not isnan(last_price) else 0.0
        eq = cash + pos * mark
        peak = max(peak, eq)
        position[i] = pos
        cash_arr[i] = cash
        equity_arr[i] = eq
        dd_arr[i] = (peak - eq) / peak if peak > 0 else 0.0

    return position, cash_arr, equity_arr, dd_arr, trades, wins


def vectorized_backtest(
    df: DataFrame,
    price: str = "close",
    buy: str = "buy",
    sell: str = "sell",
    params: BacktestParams | None = None,
    partition_by: str = "symbol",
    order_by: str = "t",
) -> DataFrame:
    """Run the fold for every symbol in one distributed pass.

    Returns the input rows + ``position, cash, equity, drawdown, n_trades,
    n_wins`` (the trade counters are repeated per row for downstream aggs —
    they're per-symbol scalars).
    """
    p = params or BacktestParams()
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    order = [order_by] if isinstance(order_by, str) else list(order_by)
    schema = StructType(
        df.schema.fields
        + [
            StructField("position", DoubleType()),
            StructField("cash", DoubleType()),
            StructField("equity", DoubleType()),
            StructField("drawdown", DoubleType()),
            StructField("n_trades", LongType()),
            StructField("n_wins", LongType()),
        ]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        px = pdf[price].to_numpy(dtype="float64", na_value=np.nan)
        # nullable-boolean route: plain .fillna(False) on the object column
        # trips the pandas silent-downcasting FutureWarning
        b = pdf[buy].astype("boolean").fillna(False).to_numpy(dtype="bool")
        s = pdf[sell].astype("boolean").fillna(False).to_numpy(dtype="bool")
        pos, cash, eq, dd, trades, wins = _fold(px, b, s, p)
        pdf["position"] = pos
        pdf["cash"] = cash
        pdf["equity"] = eq
        pdf["drawdown"] = dd
        pdf["n_trades"] = trades
        pdf["n_wins"] = wins
        return pdf

    return df.groupBy(*keys).applyInPandas(run, schema=schema)
