"""Cohort / lifecycle analytics over event streams — promoted operators.

These shapes (lifespan survival, Kaplan–Meier with censoring, retention
triangles, value-quantile migration, cohort LTV) lived as query-local
compositions in ``queries_pipeline.py`` through round 9; VERDICT r9 #5
promoted them to package entry points so a pipeline can call them on ANY
(user, day[, value]) frame, not just the test tables. Extraction is
expression-verbatim — every promoted query's golden hash is unchanged
(tools/make_golden_hashes.py: SAME) and the DuckDB twins still pass.

Input contract (documented rather than parameterized, so the promoted
expressions stay verbatim): a **user-day activity frame** with columns

* ``user_id`` — any orderable user key;
* ``day``    — integer day index (the queries derive it as
  ``epoch_us DIV 86_400_000_000`` via ``sources.bars.ts_us_expr``);
* ``cents`` — exact integer value units, only for the money operators.

Rename upstream columns with ``select``/``alias`` — a zero-cost
projection — rather than threading name parameters through every
expression.

Scale notes shared by the family: every operator collapses the event
axis FIRST (one user-keyed aggregate), so everything downstream of the
first groupBy is user-sized or distribution-sized; the survival/KM pair
further collapse users to a lifespan HISTOGRAM, so their k-grid /
risk-set logic touches a frame bounded by the distinct-lifespan count,
never the user table. Broadcasted one-row frames carry global scalars
(totals, horizons) — bounded by contract, triaged in
docs/BROADCAST_TRIAGE.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_quant_spark.functions._util import round6 as r6


def funnel_step_times(
    events: DataFrame, steps: list[str] | tuple[str, ...]
) -> DataFrame:
    """Per-user first-completion time of each ordered funnel step →
    (user_id, t0, t1, …, t{k−1}), where t_i is the user's first
    ``steps[i]`` event STRICTLY AFTER t_{i−1} (NULL once a step is never
    reached).

    Input contract: (user_id, event_type, ts_us). This is the scale
    shape for sequence analytics: each step's conditional min is a
    window over the SAME hashpartitioning(user_id) exchange (each
    window references the previous step's column — same partition spec,
    no new shuffle, no ordering needed), so the event log is shuffled
    ONCE regardless of funnel depth — the self-join-per-step form the
    SQL twins use for verification is quadratic in steps. Promoted from
    the ``events_funnel`` / ``events_funnel_latency`` queries (round 10,
    golden SAME for both)."""
    if not steps:
        raise ValueError("steps must name at least one event_type")
    w = Window.partitionBy("user_id")
    prev: str | None = None
    names: list[str] = []
    for i, step in enumerate(steps):
        cname = f"_t{i}"
        if prev is None:
            cond = F.when(F.col("event_type") == step, F.col("ts_us"))
        else:
            cond = F.when(
                (F.col("event_type") == step) & (F.col("ts_us") > F.col(prev)),
                F.col("ts_us"),
            )
        events = events.withColumn(cname, F.min(cond).over(w))
        prev = cname
        names.append(cname)
    return events.groupBy("user_id").agg(
        *[F.first(n).alias(f"t{i}") for i, n in enumerate(names)]
    )


def funnel_stage_counts(
    events: DataFrame, steps: list[str] | tuple[str, ...]
) -> DataFrame:
    """Ordered conversion funnel → (stage, n_users): users counted by the
    deepest step reached (stage 0 = entered the log but never did
    ``steps[0]``; stage k = completed every step in order). One exchange
    total — see ``funnel_step_times``. Promoted from the
    ``events_funnel`` query (round 10, golden SAME)."""
    per_user = funnel_step_times(events, steps)
    k = len(steps)
    staged = F.when(F.col(f"t{k - 1}").isNotNull(), k)
    for i in range(k - 2, -1, -1):
        staged = staged.when(F.col(f"t{i}").isNotNull(), i + 1)
    return (
        per_user.select(staged.otherwise(0).alias("stage"))
        .groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("stage")
    )


def top_event_paths(events: DataFrame, depth: int = 3, k: int = 15) -> DataFrame:
    """Top event n-grams per user journey (path mining lite) →
    (path, n): ``depth``−1 LEADs over one (user, ts_us, event_id) sort —
    the n-gram fan-out WITHOUT arrays or explodes — then a count and a
    distributed top-k (TakeOrderedAndProject). The deterministic
    (ts_us, event_id) ordering makes paths engine-exact; ties in n break
    on the path string. Input contract: (user_id, event_type, event_id,
    ts_us). Promoted from the ``events_top_paths`` query (round 10,
    golden SAME)."""
    if depth < 2:
        raise ValueError("depth must be >= 2 (a path needs two events)")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    lead_names = [f"e{i}" for i in range(2, depth + 1)]
    seq = events.select(
        "event_type",
        *[F.lead("event_type", i + 1).over(w).alias(n) for i, n in enumerate(lead_names)],
    )
    keep = F.lit(True)
    for n in lead_names:
        keep = keep & F.col(n).isNotNull()
    return (
        seq.where(keep)
        .select(F.concat_ws(">", "event_type", *lead_names).alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(k)
    )


def user_lifespans(user_days: DataFrame) -> DataFrame:
    """Per-user activity span in days: (user_id, span[, last_day]).

    span = last active day − first active day; the shared first stage of
    ``lifespan_survival`` and ``kaplan_meier``. One user-keyed aggregate —
    the only pass that touches the event-sized frame."""
    return user_days.groupBy("user_id").agg(
        (F.max("day") - F.min("day")).alias("span"),
        F.max("day").alias("last_day"),
    )


def lifespan_survival(
    user_days: DataFrame, ks: tuple[int, ...] = (0, 7, 14, 21, 28)
) -> DataFrame:
    """Naive survival curve: share of users still active ≥ k days after
    their first event, at each k in ``ks`` → (k, n_alive, survival_rate).

    'Naive' = no censoring correction (every user's span is taken at face
    value; users near the data horizon bias the tail down — use
    ``kaplan_meier`` when that matters). The user axis collapses to a
    lifespan histogram first, so the k-grid join touches a
    distribution-sized frame, never the user table. Promoted verbatim
    from the ``events_survival_curve`` query (round 10)."""
    if not ks:
        raise ValueError("ks must name at least one day offset")
    spark = user_days.sparkSession
    # the shared first stage; the unused last_day column is pruned by the
    # optimizer, so this is expression-equivalent to a span-only aggregate
    u = user_lifespans(user_days)
    g = u.groupBy("span").agg(F.count(F.lit(1)).alias("cnt"))
    tot = g.agg(F.sum("cnt").alias("n"))
    n_ks = len(ks)
    step = ks[1] - ks[0] if n_ks > 1 else 1
    if tuple(ks) == tuple(ks[0] + i * step for i in range(n_ks)):
        ks_df = spark.range(0, n_ks).select(
            (F.col("id") * step + F.lit(ks[0])).cast("int").alias("k")
        )
    else:
        ks_df = spark.createDataFrame([(int(k),) for k in ks], ["k"]).select(
            F.col("k").cast("int")
        )
    alive = F.sum(F.when(F.col("span") >= F.col("k"), F.col("cnt")).otherwise(0))
    return (
        ks_df.crossJoin(g)
        .groupBy("k")
        .agg(alive.cast("long").alias("n_alive"))
        .crossJoin(F.broadcast(tot))
        .select(
            "k",
            "n_alive",
            r6(F.col("n_alive").cast("double") / F.col("n")).alias("survival_rate"),
        )
        .orderBy("k")
    )


def kaplan_meier(user_days: DataFrame, censor_within: int = 7) -> DataFrame:
    """Kaplan–Meier survival with CENSORING → (churn_day, n_at_risk,
    n_churned, n_censored, survival).

    Users whose last event is within ``censor_within`` days of the data
    horizon are censored (still alive — they leave the risk set without
    counting as churn), which the naive curve gets wrong at the tail.
    The at-risk counts are a reverse cumsum over the lifespan
    distribution; the product estimator runs as exp(Σ ln(1−d/n)) with
    nano-quantized log terms so ordered prefix sums agree bit-for-bit
    across engines. Distribution-collapsed: nothing past the first
    aggregate is bigger than the distinct-lifespan set. Promoted verbatim
    from the ``events_kaplan_meier`` query (round 10)."""
    km0 = user_lifespans(user_days)
    gmax = km0.agg(F.max("last_day").alias("gmax"))
    kmu = km0.crossJoin(F.broadcast(gmax)).select(
        "span",
        F.when(F.col("gmax") - F.col("last_day") < censor_within, 1)
        .otherwise(0)
        .alias("censored"),
    )
    kmt = kmu.groupBy("span").agg(
        F.sum(1 - F.col("censored")).alias("d"), F.sum("censored").alias("c")
    )
    wrev = Window.orderBy(F.col("span").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    kmr = kmt.select(
        "span", "d", "c", F.sum(F.col("d") + F.col("c")).over(wrev).alias("n_risk")
    ).where((F.col("d") > 0) & (F.col("n_risk") > F.col("d")))
    wfwd = Window.orderBy("span").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    qterm = F.when(
        F.col("d") > 0,
        F.floor(
            F.log(1.0 - F.col("d").cast("double") / F.col("n_risk")) * 1e9 + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    kms = kmr.select(
        "span", "d", "c", "n_risk", F.sum(qterm).over(wfwd).alias("qln")
    )
    return kms.select(
        F.col("span").cast("long").alias("churn_day"),
        F.col("n_risk").cast("long").alias("n_at_risk"),
        F.col("d").cast("long").alias("n_churned"),
        F.col("c").cast("long").alias("n_censored"),
        r6(F.exp(F.col("qln").cast("double") / 1e9)).alias("survival"),
    ).orderBy("churn_day")


def cohort_retention(user_days: DataFrame, period: int = 7) -> DataFrame:
    """Cohort retention triangle: users bucketed by first-activity period
    (week by default), counted once per (cohort, periods-since-first)
    they were active → (cohort_week, week_offset, n_users).

    The first-activity day is a window min over the same user
    partitioning the dedup groupBy then reuses (subset partitioning
    satisfies the clustered distribution — no second user shuffle), and
    distinctness is a groupBy, not count_distinct (whose Expand would
    double the event stream). Promoted verbatim from the
    ``events_cohort_retention`` query (round 10)."""
    if period < 1:
        raise ValueError(f"period must be a positive day count, got {period}")
    w = Window.partitionBy("user_id")
    d = user_days.withColumn("_d0", F.min("day").over(w))
    pairs = (
        d.select(
            "user_id",
            F.expr(f"_d0 div {period}").alias("cohort_week"),
            F.expr(f"(day - _d0) div {period}").alias("week_offset"),
        )
        .groupBy("user_id", "cohort_week", "week_offset")
        .agg(F.lit(1))
    )
    return (
        pairs.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


def value_quantile_migration(
    user_values: DataFrame,
    before_col: str = "s1",
    after_col: str = "s2",
    n: int = 5,
) -> DataFrame:
    """Value-quantile migration matrix from two per-user value columns →
    (quantile_before, quantile_after, n_users, p) where p = P(after |
    before) — churn out of the top tiers and upgrades into them (the
    classic BI 'customer migration' view). Column names are n-agnostic
    (quartiles, deciles, … all come back as quantile_*); rename
    downstream if a tier-specific label is wanted.

    NTILE ties break on user_id so bucketing is engine-deterministic.
    Input is ONE row per user (already aggregated), so the two global
    rank windows run over a user-sized frame — at extreme user counts
    swap NTILE for a percent_rank over a pre-sorted range partitioning;
    the matrix itself is n×n. Promoted verbatim from the
    ``events_decile_migration`` query (round 10)."""
    w1 = Window.orderBy(F.col(before_col).desc(), F.col("user_id"))
    w2 = Window.orderBy(F.col(after_col).desc(), F.col("user_id"))
    dq = user_values.select(
        F.ntile(n).over(w1).alias("q1"), F.ntile(n).over(w2).alias("q2")
    )
    return (
        dq.groupBy(
            F.col("q1").cast("int").alias("quantile_before"),
            F.col("q2").cast("int").alias("quantile_after"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            "quantile_before",
            "quantile_after",
            F.col("n_users").cast("long").alias("n_users"),
            r6(
                F.col("n_users").cast("double")
                / F.sum("n_users").over(Window.partitionBy("quantile_before"))
            ).alias("p"),
        )
        .orderBy("quantile_before", "quantile_after")
    )


def cohort_ltv(
    user_day_cents: DataFrame, horizon: int = 7, period: int = 7
) -> DataFrame:
    """Cohort LTV curves: cumulative value per user by acquisition cohort
    and cohort age → (cohort_week, n_users, age_weeks, cum_ltv_per_user)
    — the money twin of the retention triangle (do newer cohorts monetize
    faster?).

    Input adds a ``cents`` column (exact integer value units; rows with
    no value carry 0 so every user's first event still defines the
    cohort). Value cumulates along each cohort's age axis up to
    ``horizon`` periods. One join against the user→cohort map
    (co-partitioned on user at scale). Promoted verbatim from the
    ``events_cohort_ltv`` query (round 10)."""
    if period < 1:
        raise ValueError(f"period must be a positive day count, got {period}")
    if horizon < 0:
        raise ValueError(f"horizon must be >= 0 periods, got {horizon}")
    clc = user_day_cents.groupBy("user_id").agg(
        F.expr(f"MIN(day) DIV {period}").alias("cohort_week")
    )
    clj = user_day_cents.join(clc, "user_id").select(
        "cohort_week",
        (F.expr(f"day DIV {period}") - F.col("cohort_week")).alias("age_weeks"),
        "cents",
    )
    cla = (
        clj.where(F.col("age_weeks").between(0, horizon))
        .groupBy("cohort_week", "age_weeks")
        .agg(F.sum("cents").alias("rev"))
    )
    cln = clc.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("n_users"))
    wc = Window.partitionBy("cohort_week").orderBy("age_weeks").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        cla.join(F.broadcast(cln), "cohort_week")
        .select(
            "cohort_week",
            F.col("n_users").cast("long").alias("n_users"),
            F.col("age_weeks").cast("long").alias("age_weeks"),
            r6(
                F.sum("rev").over(wc).cast("double") / 100.0 / F.col("n_users")
            ).alias("cum_ltv_per_user"),
        )
        .orderBy("cohort_week", "age_weeks")
    )
