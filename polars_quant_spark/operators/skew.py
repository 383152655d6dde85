"""Skew-breaking joins and aggregations for hot keys.

AQE's skew-join rewrite (enabled in session.py) splits oversized *shuffle
partitions*, which handles moderate skew transparently. It cannot help when
a single join KEY is hot enough that every row of that key must still meet
every matching row — e.g. joining a 100 TB event log against a user table
where one bot user owns 5% of all events. ``salted_join`` is the explicit
remedy: fan the small side out `salt` ways and scatter the big side across
the replicas, so one hot key occupies `salt` reducers instead of one.

The salt assignment is `pmod(xxhash64(<big side's other columns>), salt)` —
deterministic (re-runs and retried tasks produce identical output, unlike
``F.rand``-based salting) and key-independent, so a hot key's rows spread by
whatever else distinguishes them.

Skewed *aggregation* needs no helper: the two-level pattern used throughout
``queries.py`` (partial agg on (keys, spark_partition_id()), merge on keys)
is the aggregation-side equivalent — partials bound any key's reducer input
by the partition count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]

_SALT = "__pqs_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `big` ⋈ `small` on `on`, with the hot-key shuffle spread
    `salt` ways.

    `small` is replicated `salt` times (one `explode(sequence(...))` —
    row count × salt, fine for dimension-sized sides); each `big` row gets a
    deterministic salt from its non-key columns. The shuffle keys become
    (on..., salt), so a single hot key lands on `salt` reducers. Result
    equals the plain join (asserted in tests/test_analytics_ops.py).

    `how`: 'inner' or 'left' (left = keep unmatched big rows). Anything
    needing the small side's unmatched rows ('right'/'outer') would count
    every unmatched small row `salt` times — rejected."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    for k in keys:
        if k not in big.columns or k not in small.columns:
            raise ValueError(f"join key {k!r} missing from an input")
    if salt < 2:
        return big.join(small, keys, how)

    non_key = [c for c in big.columns if c not in keys]
    # xxhash64 over the non-key payload: deterministic, and independent of
    # the join key so a hot key's rows scatter. An all-key big side (bare
    # key list) degenerates to salt 0 — correct, just unspread.
    salt_expr = (
        F.pmod(F.xxhash64(*[F.col(c) for c in non_key]), F.lit(salt))
        if non_key
        else F.lit(0)
    )
    b = big.withColumn(_SALT, salt_expr.cast("int"))
    s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return b.join(s, keys + [_SALT], how).drop(_SALT)
