"""Custom stateful streaming operators via applyInPandasWithState.

The reference's sequential backtester is "the natural streaming candidate
(stateful per-key fold)" (SURVEY §2.7). These operators carry per-key state
across micro-batches:

* ``streaming_ema`` — per-symbol EMA whose state (last smoothed value +
  warm-up buffer) survives batch boundaries; the streaming twin of the batch
  recurrence runner.
* ``streaming_position`` — per-symbol long-flat position fold (the
  vectorized backtester's state machine) over a signal stream.

State is a tiny tuple per key, stored in the state store — size is bounded
by key cardinality, not stream length.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EMA_OUT = StructType(
    [
        StructField("symbol", StringType()),
        StructField("ts_us", LongType()),
        StructField("close", DoubleType()),
        StructField("ema", DoubleType()),
    ]
)

# state: (n_seen, warmup_sum, ema_value)
EMA_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("acc", DoubleType()),
        StructField("ema", DoubleType()),
    ]
)


def _ema_fn(p: int):
    alpha = 2.0 / (p + 1)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (symbol,) = key
        if state.exists:
            n, acc, e = state.get
        else:
            n, acc, e = 0, 0.0, float("nan")
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts_us"])
            out_ema = []
            for px in pdf["close"]:
                n += 1
                if n < p:
                    acc += px
                    out_ema.append(None)
                elif n == p:
                    acc += px
                    e = acc / p
                    out_ema.append(e)
                else:
                    e = e + alpha * (px - e)
                    out_ema.append(e)
            yield pd.DataFrame(
                {
                    "symbol": symbol,
                    "ts_us": pdf["ts_us"],
                    "close": pdf["close"],
                    "ema": out_ema,
                }
            )
        state.update((n, acc, e if e == e else 0.0))

    return fn


def streaming_ema(events: DataFrame, p: int = 20) -> DataFrame:
    """Per-symbol streaming EMA with SMA seeding — identical semantics to the
    batch kernel, state carried across micro-batches. Input needs
    (symbol, ts_us, close) columns."""
    return events.groupBy("symbol").applyInPandasWithState(
        _ema_fn(p),
        outputStructType=EMA_OUT,
        stateStructType=EMA_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


POS_OUT = StructType(
    [
        StructField("symbol", StringType()),
        StructField("ts_us", LongType()),
        StructField("position", DoubleType()),
        StructField("cash", DoubleType()),
        StructField("equity", DoubleType()),
    ]
)

POS_STATE = StructType(
    [
        StructField("position", DoubleType()),
        StructField("cash", DoubleType()),
    ]
)


def _position_fn(initial_capital: float):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (symbol,) = key
        pos, cash = state.get if state.exists else (0.0, initial_capital)
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts_us"])
            out = {"ts_us": [], "position": [], "cash": [], "equity": []}
            for _, row in pdf.iterrows():
                px = float(row["close"])
                if px > 0:
                    if bool(row["sell"]) and pos > 0:
                        cash += pos * px
                        pos = 0.0
                    elif bool(row["buy"]) and pos == 0:
                        shares = float(int(cash / px))
                        if shares > 0:
                            cash -= shares * px
                            pos = shares
                out["ts_us"].append(row["ts_us"])
                out["position"].append(pos)
                out["cash"].append(cash)
                out["equity"].append(cash + pos * px)
            yield pd.DataFrame({"symbol": symbol, **out})
        state.update((pos, cash))

    return fn


def streaming_position(signals: DataFrame, initial_capital: float = 100_000.0) -> DataFrame:
    """Long-flat position fold over a streaming signal frame
    (symbol, ts_us, close, buy, sell) — the streaming variant of the
    vectorized backtester's state machine (zero-cost config)."""
    return signals.groupBy("symbol").applyInPandasWithState(
        _position_fn(initial_capital),
        outputStructType=POS_OUT,
        stateStructType=POS_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Per-source token-quota admission
# ---------------------------------------------------------------------------

QUOTA_OUT = StructType(
    [
        StructField("source", StringType()),
        StructField("doc_id", LongType()),
        StructField("n_tokens", LongType()),
        StructField("cum_tokens", LongType()),
    ]
)

# state: running token total over ALL docs seen for the source (prefix rule)
QUOTA_STATE = StructType([StructField("cum", LongType())])


def _quota_fn(budget: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        cum = state.get[0] if state.exists else 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values("doc_id")
            run = pdf["n_tokens"].astype("int64").cumsum() + cum
            cum = int(run.iloc[-1])
            keep = run <= budget
            if keep.any():
                yield pd.DataFrame(
                    {
                        "source": source,
                        "doc_id": pdf["doc_id"][keep].astype("int64"),
                        "n_tokens": pdf["n_tokens"][keep].astype("int64"),
                        "cum_tokens": run[keep].astype("int64"),
                    }
                )
        state.update((cum,))

    return fn


def streaming_source_quota(docs: DataFrame, budget: int = 10_000) -> DataFrame:
    """Streaming per-source token-budget admission — the ingest-side quota
    that caps any one source's contribution to a training corpus (the
    batch-side equivalent is a cumsum window; this is its arrival-time
    twin). Keyed by source; state is a single running-total long per key
    (bounded by source cardinality, not stream length), and each batch is
    one vectorized cumsum — no per-row Python.

    Input must carry (source, doc_id, n_tokens). Admission uses the prefix
    rule over ALL docs seen (admitted or not), so with an ordered drain
    the output is engine-exact against the batch SQL window twin.

    Spark 4's transformWithStateInPandas is the native home for this
    operator (ValueState per key, TTL, timers); this runtime lacks its
    protobuf dependency, so the op rides applyInPandasWithState — same
    state contract, same output."""
    return docs.groupBy("source").applyInPandasWithState(
        _quota_fn(budget),
        outputStructType=QUOTA_OUT,
        stateStructType=QUOTA_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming rolling z-score anomaly detector (bounded per-key buffer)
# ---------------------------------------------------------------------------

from pyspark.sql.types import ArrayType  # noqa: E402

ZS_OUT = StructType(
    [
        StructField("event_type", StringType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
        StructField("z", DoubleType()),
    ]
)

# state: the last (window-1) micro-quantized values, oldest first
ZS_STATE = StructType([StructField("buf", ArrayType(LongType()))])


def _zscore_fn(window: int, threshold: float):
    import numpy as np

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (etype,) = key
        buf = list(state.get[0]) if state.exists else []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(["ts_us", "event_id"])
            qv = np.floor(
                pdf["value"].to_numpy(dtype="float64") * 1e6 + 0.5
            ).astype("int64")
            concat = np.concatenate([np.asarray(buf, dtype="int64"), qv])
            s1 = np.concatenate([[0], np.cumsum(concat)])
            s2 = np.concatenate([[0], np.cumsum(concat.astype(object) * concat)])
            k = len(buf)
            out = []
            for j in range(len(qv)):
                i = k + j  # position in concat
                if i + 1 < window:
                    continue
                S1 = int(s1[i + 1] - s1[i + 1 - window])
                S2 = int(s2[i + 1] - s2[i + 1 - window])
                mu = S1 / 1e6 / window
                var = S2 / 1e12 / window - mu * mu
                if var <= 0:
                    continue
                sd = var ** 0.5
                z = (qv[j] / 1e6 - mu) / sd
                if abs(z) > threshold:
                    out.append(
                        (etype, int(pdf["event_id"].iloc[j]), qv[j] / 1e6, z)
                    )
            buf = list(concat[-(window - 1):])
            # always yield a dtype-stable frame (an omitted/implicit empty
            # yield makes Spark's serializer concat all-NA blocks → pandas
            # FutureWarning noise in the driver log)
            yield pd.DataFrame(
                {
                    "event_type": pd.Series([r[0] for r in out], dtype="object"),
                    "event_id": pd.Series([r[1] for r in out], dtype="int64"),
                    "value": pd.Series([r[2] for r in out], dtype="float64"),
                    "z": pd.Series([r[3] for r in out], dtype="float64"),
                }
            )
        state.update(([int(x) for x in buf],))

    return fn


def streaming_zscore(
    events: DataFrame, window: int = 50, threshold: float = 3.0
) -> DataFrame:
    """Streaming rolling z-score anomaly detector: each event's value vs
    the trailing-``window`` mean/σ of its event type, flagging
    |z| > threshold — the arrival-time twin of the batch
    events_anomaly_zscore. State is the last window−1 MICRO-QUANTIZED
    values per key (bounded, integer-exact), so the window moments are
    pure functions of the data: integer sums → identical double formula
    on every engine and every replay. Python-object cumsum keeps the
    squared sums exact beyond int64 (values are bounded in practice;
    correctness first).

    Input must carry (event_type, event_id, ts_us, value)."""
    return events.groupBy("event_type").applyInPandasWithState(
        _zscore_fn(window, threshold),
        outputStructType=ZS_OUT,
        stateStructType=ZS_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# CDC latest-wins compaction (streaming upsert → current-state table)
# ---------------------------------------------------------------------------

CDC_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("last_ts_us", LongType()),
        StructField("last_event_id", LongType()),
        StructField("last_event_type", StringType()),
        StructField("last_value", DoubleType()),
    ]
)

# state: (ts_us, event_id, event_type, value) of the winner — the FULL
# (ts_us, event_id) pair orders lexicographically, so ties on ts_us are
# broken deterministically by event_id with no packed-composite collisions
# (the r2 us*4096 + id%4096 rank collided when two events shared ts_us and
# event_ids equal mod 4096).
CDC_STATE = StructType(
    [
        StructField("ts_us", LongType()),
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _latest_fn():
    import numpy as np

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        best = tuple(state.get) if state.exists else None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            ts = pdf["ts_us"].to_numpy(dtype="int64")
            eid = pdf["event_id"].to_numpy(dtype="int64")
            # lexsort: last key is primary → max ts_us, ties by max event_id
            i = int(np.lexsort((eid, ts))[-1])
            cand = (
                int(ts[i]),
                int(eid[i]),
                str(pdf["event_type"].iloc[i]),
                float(pdf["value"].iloc[i]),
            )
            if best is None or cand[:2] > best[:2]:
                best = cand
        state.update(best)
        yield pd.DataFrame(
            [
                {
                    "user_id": uid,
                    "last_ts_us": best[0],
                    "last_event_id": best[1],
                    "last_event_type": best[2],
                    "last_value": best[3],
                }
            ]
        )

    return fn


def streaming_latest_compact(events: DataFrame) -> DataFrame:
    """CDC latest-wins compaction: the change stream folds to ONE current
    row per key — the lakehouse upsert/SCD-1 primitive. State per key is a
    single (ts, event_id, type, value) tuple; each batch reduces
    vectorized to its per-key lexicographic max on the FULL
    (ts_us, event_id) pair (np.lexsort — the same ORDER BY ts_us DESC,
    event_id DESC the SQL twin uses, so ordering is engine-identical and
    collision-free), then merges with state. Emits the post-merge current
    row each batch: with an availableNow drain the sink's last row per
    key IS the compacted table.

    Input must carry (user_id, event_id, ts_us, event_type, value)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _latest_fn(),
        outputStructType=CDC_OUT,
        stateStructType=CDC_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
