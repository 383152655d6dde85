"""Sequential (event-driven) backtester.

The reference's SequentialBacktester (/root/reference/src/backtest/
sequential.rs:1-337, SURVEY §2.6/§3.3) calls an arbitrary Python strategy
callback once per bar — a contract that cannot distribute (per-bar
user-Python with sequential portfolio state). Spark-first split:

* Spark does the heavy lifting — alignment, indicators, signal columns —
  producing an ordered bar stream;
* the event loop itself runs driver-side over ``toLocalIterator()`` (bounded
  memory: one partition at a time), with Portfolio / ExecutionEngine /
  OrderContext in pure Python replicating sequential.rs:48-205 semantics;
* results (equity curve) are re-parallelized for metric aggregation.

Deliberate fix vs the snapshot (SURVEY §0/§2.6): the reference *overwrites*
the average entry price on every buy (sequential.rs:133-134); we compute the
proper weighted average-in. ``compat="reference"`` restores overwrite
semantics for parity testing.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from math import isnan
from typing import Callable

from pyspark.sql import DataFrame


@dataclass
class Order:
    """A staged order (sequential.rs:7-11)."""

    target_asset: str
    quantity: float  # >0 buy, <0 sell
    execution_price: float


class OrderContext:
    """Per-bar order staging surface handed to the strategy callback
    (sequential.rs:174-205): rejects NaN/≤0 price and ≤0 quantity."""

    def __init__(self) -> None:
        self.orders: list[Order] = []

    def buy(self, asset: str, quantity: float, price: float) -> bool:
        if quantity <= 0 or price <= 0 or isnan(price):
            return False
        self.orders.append(Order(asset, float(quantity), float(price)))
        return True

    def sell(self, asset: str, quantity: float, price: float) -> bool:
        if quantity <= 0 or price <= 0 or isnan(price):
            return False
        self.orders.append(Order(asset, -float(quantity), float(price)))
        return True


@dataclass
class FillReceipt:
    asset: str
    quantity: float
    fill_price: float
    commission: float
    notional: float


@dataclass
class ExecutionEngine:
    """Slippage + commission fill simulation with cash/position admission
    (sequential.rs:48-97)."""

    buy_slippage: float = 0.0
    sell_slippage: float = 0.0
    buy_commission_rate: float = 3e-4
    sell_commission_rate: float = 3e-4
    minimum_commission_fee: float = 5.0

    def process_order(self, order: Order, cash: float, position: float) -> FillReceipt | None:
        if order.quantity > 0:
            fill = order.execution_price + self.buy_slippage
            if fill <= 0:
                return None
            notional = order.quantity * fill
            fee = max(self.buy_commission_rate * notional, self.minimum_commission_fee)
            if notional + fee > cash:  # admission: enough cash (sequential.rs:62)
                return None
            return FillReceipt(order.target_asset, order.quantity, fill, fee, notional)
        else:
            qty = -order.quantity
            if qty > position:  # admission: enough position (sequential.rs:76)
                return None
            fill = order.execution_price - self.sell_slippage
            if fill <= 0:
                return None
            notional = qty * fill
            fee = max(self.sell_commission_rate * notional, self.minimum_commission_fee)
            return FillReceipt(order.target_asset, order.quantity, fill, fee, notional)


@dataclass
class Portfolio:
    """Cash/position bookkeeping + mark-to-market (sequential.rs:99-172)."""

    cash: float
    compat: str = "fixed"  # "reference" = overwrite avg entry on buy
    positions: dict[str, float] = field(default_factory=dict)
    entry_price: dict[str, float] = field(default_factory=dict)
    wins: int = 0
    trades: int = 0

    def apply_fill(self, fill: FillReceipt) -> None:
        asset = fill.asset
        pos = self.positions.get(asset, 0.0)
        if fill.quantity > 0:
            self.cash -= fill.notional + fill.commission
            new_pos = pos + fill.quantity
            if self.compat == "reference" or pos == 0.0:
                # snapshot overwrites avg entry (sequential.rs:133-134)
                self.entry_price[asset] = fill.fill_price
            else:
                self.entry_price[asset] = (
                    self.entry_price.get(asset, 0.0) * pos + fill.fill_price * fill.quantity
                ) / new_pos
            self.positions[asset] = new_pos
        else:
            qty = -fill.quantity
            self.cash += fill.notional - fill.commission
            cost_basis = self.entry_price.get(asset, 0.0) * qty
            self.trades += 1
            if fill.notional - fill.commission > cost_basis:  # sequential.rs:142-149
                self.wins += 1
            self.positions[asset] = pos - qty
            if self.positions[asset] <= 0:
                self.positions.pop(asset, None)
                self.entry_price.pop(asset, None)

    def calculate_equity(self, last_prices: dict[str, float]) -> float:
        eq = self.cash
        for asset, pos in self.positions.items():
            eq += pos * last_prices.get(asset, 0.0)
        return eq


class SequentialBacktester:
    """Multi-asset event loop over a long-format bar DataFrame.

    ``historical_data`` must contain (date_col, symbol_col, price_col) plus
    whatever the strategy reads. The callback receives
    ``(ctx: OrderContext, bar: dict)`` per (date, symbol) row — equivalent to
    the reference's ``(ctx, i)`` positional contract with the row made
    explicit (Spark has no stable global row index).
    """

    def __init__(
        self,
        historical_data: DataFrame,
        initial_capital: float = 100_000.0,
        buy_slippage: float = 0.0,
        sell_slippage: float = 0.0,
        buy_commission_rate: float = 3e-4,
        sell_commission_rate: float = 3e-4,
        minimum_commission_fee: float = 5.0,
        date_col: str = "t",
        symbol_col: str = "symbol",
        price_col: str = "close",
        compat: str = "fixed",
    ) -> None:
        self.df = historical_data
        self.initial_capital = initial_capital
        self.engine = ExecutionEngine(
            buy_slippage,
            sell_slippage,
            buy_commission_rate,
            sell_commission_rate,
            minimum_commission_fee,
        )
        self.date_col = date_col
        self.symbol_col = symbol_col
        self.price_col = price_col
        self.compat = compat

    def run(
        self, strategy_callback: Callable[[OrderContext, dict], None]
    ) -> tuple[DataFrame, DataFrame, dict]:
        """Returns (positions_df, equity_df, metrics) like
        sequential.rs:324-335. Bars stream through the driver ordered by
        (date, symbol) via toLocalIterator — one partition in memory at a
        time."""
        spark = self.df.sparkSession
        ordered = self.df.orderBy(self.date_col, self.symbol_col)
        portfolio = Portfolio(self.initial_capital, compat=self.compat)
        last_prices: dict[str, float] = {}
        equity_rows: list[tuple] = []
        position_rows: list[tuple] = []

        for row in ordered.toLocalIterator():
            bar = row.asDict()
            sym = bar[self.symbol_col]
            px = bar.get(self.price_col)
            ctx = OrderContext()
            strategy_callback(ctx, bar)
            if px is not None and not isnan(px) and px > 0:
                last_prices[sym] = float(px)
            for order in ctx.orders:
                fill = self.engine.process_order(
                    order,
                    portfolio.cash,
                    portfolio.positions.get(order.target_asset, 0.0),
                )
                if fill is not None:
                    portfolio.apply_fill(fill)
            eq = portfolio.calculate_equity(last_prices)
            equity_rows.append((bar[self.date_col], portfolio.cash, eq))
            for asset, pos in portfolio.positions.items():
                position_rows.append((bar[self.date_col], asset, pos))

        equity_df = spark.createDataFrame(equity_rows, ["date", "cash", "equity"])
        positions_df = (
            spark.createDataFrame(position_rows, ["date", "asset", "position"])
            if position_rows
            else spark.createDataFrame([], "date string, asset string, position double")
        )
        metrics = _curve_metrics(
            [e[2] for e in equity_rows], self.initial_capital, portfolio.trades, portfolio.wins
        )
        return positions_df, equity_df, metrics


def _curve_metrics(equity: list[float], initial: float, trades: int, wins: int) -> dict:
    """Driver-side twin of metrics.rs:7-152 for the sequential engine."""
    import math

    if not equity:
        return {}
    n = len(equity)
    total = equity[-1] / initial - 1.0
    annualized = (1.0 + total) ** (252.0 / n) - 1.0
    peak = initial
    mdd = 0.0
    rets = []
    prev = None
    for e in equity:
        peak = max(peak, e)
        if peak > 0:
            mdd = max(mdd, (peak - e) / peak)
        if prev is not None and prev != 0:
            rets.append(e / prev - 1.0)
        prev = e
    if len(rets) > 1:
        mu = sum(rets) / len(rets)
        var = sum((r - mu) ** 2 for r in rets) / (len(rets) - 1)
        vol = math.sqrt(var)
    else:
        vol = 0.0
    sharpe = (annualized - 0.03) / (vol * math.sqrt(252.0)) if vol > 0 else 0.0
    return {
        "total_return": total,
        "annualized_return": annualized,
        "max_drawdown": mdd,
        "volatility": vol,
        "sharpe": sharpe,
        "win_rate": wins / trades if trades else 0.0,
        "total_trades": float(trades),
        "max_profit": max(total, 0.0),
    }
