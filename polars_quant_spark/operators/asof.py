"""As-of and range joins — operators Spark lacks natively (SURVEY §2.3; the
reference gets as-of semantics implicitly from grid-join + forward fill).

``asof_join`` is the explicit form: for every left row, the latest right row
with right.time ≤ left.time (per key), within an optional tolerance.

Implementation: union the two sides tagged with a priority, one window pass
per key ordered by (time, priority), forward-fill the right payload — ONE
shuffle, no range-explosion join. This is the standard scale-safe as-of plan
(a join + filter + row_number plan would shuffle both sides *and* blow up on
dense right sides)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str] | None = None,
    tolerance: int | None = None,
    direction: str = "backward",
    right_prefix: str = "r_",
) -> DataFrame:
    """For each left row: the most recent right row at-or-before (backward)
    or the earliest at-or-after (forward) on the ``on`` column, matching the
    ``by`` keys. ``tolerance`` bounds |left.on − right.on| (same units as on).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    keys = [by] if isinstance(by, str) else list(by or [])
    payload = [c for c in right.columns if c != on and c not in keys]

    lt = left.withColumn("_side", F.lit(1))
    rt = right.select(
        *keys,
        F.col(on),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in payload],
    ).withColumn("_side", F.lit(0))
    unioned = lt.unionByName(rt, allowMissingColumns=True)

    if direction == "backward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(on).asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        fill = F.last
    else:
        # forward match as a RUNNING frame over the reversed sort — the
        # (0, unboundedFollowing) + first-ignorenulls form makes Spark
        # rescan the partition remainder per row (quadratic; see
        # clean.interpolate_linear). Reversing (on DESC, _side ASC) keeps
        # the same match: preceding rows have on' ≥ on, right rows sort
        # before left at equal on (so equal-timestamp rights still match),
        # and `last ignorenulls` picks the nearest following right row.
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(on).desc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        fill = F.last

    out = unioned
    for c in payload:
        out = out.withColumn(f"{right_prefix}{c}", fill(f"{right_prefix}{c}", ignorenulls=True).over(w))
    matched_on = fill(F.when(F.col("_side") == 0, F.col(on)), ignorenulls=True).over(w)
    out = out.withColumn(f"{right_prefix}{on}", matched_on)
    out = out.where(F.col("_side") == 1).drop("_side")
    if tolerance is not None:
        dist = F.abs(F.col(on) - F.col(f"{right_prefix}{on}"))
        out = out.select(
            *[c for c in out.columns if not c.startswith(right_prefix)],
            *[
                F.when(dist <= tolerance, F.col(c)).alias(c)
                for c in out.columns
                if c.startswith(right_prefix)
            ],
        )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    by: str | list[str] | None = None,
) -> DataFrame:
    """Point-in-interval join: left rows matched to right intervals
    [right_lo, right_hi) sharing the ``by`` keys. Small right side →
    broadcast-NL (cheap); for a large right side use
    ``binned_range_join`` (hash equi-join on coarse bins)."""
    keys = [by] if isinstance(by, str) else list(by or [])
    cond = (F.col(left_point) >= F.col(right_lo)) & (F.col(left_point) < F.col(right_hi))
    for k in keys:
        cond = cond & (left[k] == right[k])
    return left.join(F.broadcast(right), cond)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bin_width: int,
    by: str | list[str] | None = None,
) -> DataFrame:
    """Interval×interval overlap join ([l_lo,l_hi) ∩ [r_lo,r_hi) ≠ ∅) via
    the same coarse-bin equi-join strategy as ``binned_range_join`` —
    the general form where BOTH sides are large interval sets.

    Both sides explode into the bins they overlap, so an overlapping pair
    meets in EVERY shared bin; the pair is kept only in its overlap's
    first bin (the bin of max(l_lo, r_lo)) — a pure filter, no distinct
    needed. Cost: each side amplified by ~span/bin_width, one hash
    shuffle each, AQE-splittable skew — versus the NL join's
    broadcast-or-die."""
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    keys = [by] if isinstance(by, str) else list(by or [])

    def binned(df: DataFrame, lo: str, hi: str) -> DataFrame:
        return df.withColumn(
            "_bin",
            F.explode(
                F.sequence(
                    F.expr(f"CAST({lo} AS BIGINT) div {bin_width}"),
                    F.expr(f"(CAST({hi} AS BIGINT) - 1) div {bin_width}"),
                )
            ),
        )

    lt, rt = binned(left, left_lo, left_hi), binned(right, right_lo, right_hi)
    overlap = (F.col(left_lo) < F.col(right_hi)) & (F.col(right_lo) < F.col(left_hi))
    first_bin = F.col("_bin") == F.expr(
        f"CAST(greatest({left_lo}, {right_lo}) AS BIGINT) div {bin_width}"
    )
    return lt.join(rt, [*keys, "_bin"]).where(overlap & first_bin).drop("_bin")


def binned_range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bin_width: int,
    by: str | list[str] | None = None,
) -> DataFrame:
    """``range_join`` for a LARGE right side — the scale path the
    broadcast-NL form can't take. Integer domains (epoch-µs, bar index).

    Each right interval explodes into the coarse bins it overlaps
    (``sequence(lo div w, (hi−1) div w)``); each left point lands in exactly
    one bin; a hash equi-join on (keys…, bin) + the exact range filter gives
    the same pairs as the NL join with NO duplicate elimination needed — a
    (point, interval) pair can only meet in the point's own bin.

    Cost: right side amplified by ~(span/bin_width)+1 rows, both sides one
    hash shuffle — choose ``bin_width`` near the typical interval span so
    amplification stays O(1) and bins stay selective. Skewed hot bins are
    ordinary join skew: AQE's skew-join splitting applies (unlike the NL
    plan, which AQE cannot help)."""
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    keys = [by] if isinstance(by, str) else list(by or [])
    rt = right.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.expr(f"CAST({right_lo} AS BIGINT) div {bin_width}"),
                F.expr(f"(CAST({right_hi} AS BIGINT) - 1) div {bin_width}"),
            )
        ),
    )
    lt = left.withColumn("_bin", F.expr(f"CAST({left_point} AS BIGINT) div {bin_width}"))
    cond = (F.col(left_point) >= F.col(right_lo)) & (F.col(left_point) < F.col(right_hi))
    return lt.join(rt, [*keys, "_bin"]).where(cond).drop("_bin")
