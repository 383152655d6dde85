"""operators/events.py — the promoted cohort family (round 10).

The five registered queries prove default-parameter parity against DuckDB
(and golden SAME proves the promotion was expression-verbatim); these
tests pin the operator SEMANTICS on hand-computed micro-corpora and cover
the parameter paths the queries never take (non-uniform k grids,
non-weekly periods, quartile migration, custom censor horizons)."""

from __future__ import annotations

import math

import pytest


def _user_days(spark, rows):
    return spark.createDataFrame(rows, ["user_id", "day"])


def test_lifespan_survival_hand_computed(spark):
    from polars_quant_spark.operators.events import lifespan_survival

    # spans: u1=0, u2=5, u3=10
    rows = [("u1", 3), ("u2", 0), ("u2", 5), ("u3", 2), ("u3", 12), ("u3", 7)]
    out = lifespan_survival(_user_days(spark, rows), ks=(0, 4, 8)).collect()
    got = {r["k"]: (r["n_alive"], r["survival_rate"]) for r in out}
    assert got == {0: (3, 1.0), 4: (2, round(2 / 3, 6)), 8: (1, round(1 / 3, 6))}


def test_lifespan_survival_non_uniform_grid(spark):
    """A non-arithmetic k grid takes the createDataFrame branch (the
    queries only ever use the range-generated 0,7,...,28 grid)."""
    from polars_quant_spark.operators.events import lifespan_survival

    rows = [("a", 0), ("a", 9), ("b", 1)]
    out = lifespan_survival(_user_days(spark, rows), ks=(0, 3, 10)).collect()
    got = {r["k"]: r["n_alive"] for r in out}
    assert got == {0: 2, 3: 1, 10: 0}
    assert [r["k"] for r in out] == [0, 3, 10]


def test_kaplan_meier_censoring_separates_churn_from_horizon(spark):
    from polars_quant_spark.operators.events import kaplan_meier

    # horizon gmax = 20. u1: span 5, last 5  -> churned at 5
    #                    u2: span 5, last 19 -> censored (within 3 of 20)
    #                    u3: span 9, last 9  -> churned at 9
    rows = [("u1", 0), ("u1", 5), ("u2", 14), ("u2", 19), ("u3", 0), ("u3", 9)]
    out = kaplan_meier(_user_days(spark, rows), censor_within=3).collect()
    by_day = {r["churn_day"]: r for r in out}
    # at span 5: risk set = all 3, d=1 (u1), c=1 (u2) -> S = 1 - 1/3
    assert by_day[5]["n_at_risk"] == 3
    assert by_day[5]["n_churned"] == 1
    assert by_day[5]["n_censored"] == 1
    assert by_day[5]["survival"] == pytest.approx(2 / 3, abs=1e-6)
    # at span 9: risk set = 1 (u2 left as censored), d=1 -> row filtered
    # (n_risk == d, the estimator's guard) so day 9 must NOT appear
    assert 9 not in by_day
    assert set(by_day) == {5}


def test_kaplan_meier_quantized_log_matches_product(spark):
    """exp(sum of nano-quantized ln terms) tracks the true KM product to
    ~1e-6 — the cross-engine determinism trade documented on the op."""
    from polars_quant_spark.operators.events import kaplan_meier

    rows = []
    for i, span in enumerate([2, 2, 4, 6, 6, 6, 8]):
        rows += [(f"u{i}", 0), (f"u{i}", span)]
    out = kaplan_meier(_user_days(spark, rows), censor_within=1).collect()
    s = 1.0
    n = 7
    for r in sorted(out, key=lambda r: r["churn_day"]):
        s *= 1.0 - r["n_churned"] / r["n_at_risk"]
        assert r["survival"] == pytest.approx(s, abs=2e-6)
        n -= r["n_churned"]


def test_cohort_retention_biweekly_period(spark):
    from polars_quant_spark.operators.events import cohort_retention

    # period=14: u1 first day 0 (cohort 0), active days 0 and 15 (offsets 0,1)
    #            u2 first day 14 (cohort 1), active day 14 only
    rows = [("u1", 0), ("u1", 15), ("u2", 14), ("u1", 1)]
    out = cohort_retention(_user_days(spark, rows), period=14).collect()
    got = {(r["cohort_week"], r["week_offset"]): r["n_users"] for r in out}
    assert got == {(0, 0): 1, (0, 1): 1, (1, 0): 1}


def test_value_quantile_migration_quartiles(spark):
    from polars_quant_spark.operators.events import value_quantile_migration

    rows = [(f"u{i}", (i + 1) * 100, ((7 - i) % 8 + 1) * 100) for i in range(8)]
    df = spark.createDataFrame(rows, ["user_id", "s1", "s2"])
    out = value_quantile_migration(df, n=4).collect()
    # s1 descending = u8..u1; s2 descending reverses it (u1 highest after):
    # before-quartile 1 (u8,u7) lands in after-quartile 4, etc. Output
    # names are n-agnostic (quantile_*, round-10 review finding).
    got = {(r["quantile_before"], r["quantile_after"]): r["n_users"] for r in out}
    assert got == {(1, 4): 2, (2, 3): 2, (3, 2): 2, (4, 1): 2}
    assert all(r["p"] == 1.0 for r in out)


def test_cohort_ltv_cumulates_and_respects_horizon(spark):
    from polars_quant_spark.operators.events import cohort_ltv

    # one cohort (first day 0), spends 100c at age 0, 50c at age 1,
    # and 999c beyond the horizon (age 3 > horizon 2) — excluded.
    rows = [("u1", 0, 100), ("u1", 8, 50), ("u1", 22, 999), ("u2", 1, 0)]
    df = spark.createDataFrame(rows, ["user_id", "day", "cents"])
    out = cohort_ltv(df, horizon=2, period=7).collect()
    got = {(r["cohort_week"], r["age_weeks"]): r for r in out}
    assert set(got) == {(0, 0), (0, 1)}
    assert got[(0, 0)]["n_users"] == 2
    assert got[(0, 0)]["cum_ltv_per_user"] == pytest.approx(100 / 100.0 / 2)
    assert got[(0, 1)]["cum_ltv_per_user"] == pytest.approx(150 / 100.0 / 2)


def test_user_lifespans_shape(spark):
    from polars_quant_spark.operators.events import user_lifespans

    rows = [("a", 1), ("a", 4), ("b", 2)]
    out = {r["user_id"]: (r["span"], r["last_day"])
           for r in user_lifespans(_user_days(spark, rows)).collect()}
    assert out == {"a": (3, 4), "b": (0, 2)}


def _events(spark, rows):
    return spark.createDataFrame(rows, ["user_id", "event_type", "ts_us"])


def test_funnel_step_times_strict_ordering(spark):
    """A click BEFORE the first view must not count as step 1 — each step
    is the first matching event strictly after the previous step."""
    from polars_quant_spark.operators.events import funnel_step_times

    rows = [
        ("u1", "click", 5), ("u1", "view", 10), ("u1", "click", 20),
        ("u2", "view", 1), ("u2", "click", 2), ("u2", "buy", 3),
    ]
    out = {r["user_id"]: (r["t0"], r["t1"], r["t2"])
           for r in funnel_step_times(_events(spark, rows),
                                      ["view", "click", "buy"]).collect()}
    assert out["u1"] == (10, 20, None)
    assert out["u2"] == (1, 2, 3)


def test_funnel_stage_counts_four_steps(spark):
    """A 4-step funnel exercises the generated descending when-chain
    beyond the 3-step shape the queries pin."""
    from polars_quant_spark.operators.events import funnel_stage_counts

    rows = [
        ("u0", "other", 1),                                   # stage 0
        ("u1", "a", 1),                                       # stage 1
        ("u2", "a", 1), ("u2", "b", 2),                       # stage 2
        ("u3", "a", 1), ("u3", "b", 2), ("u3", "c", 3),       # stage 3
        ("u4", "a", 1), ("u4", "b", 2), ("u4", "c", 3), ("u4", "d", 4),
    ]
    out = {r["stage"]: r["n_users"]
           for r in funnel_stage_counts(_events(spark, rows),
                                        ["a", "b", "c", "d"]).collect()}
    assert out == {0: 1, 1: 1, 2: 1, 3: 1, 4: 1}


def test_top_event_paths_bigrams_and_ties(spark):
    from polars_quant_spark.operators.events import top_event_paths

    rows = [
        ("u1", "a", 1, 10), ("u1", "b", 2, 20), ("u1", "c", 3, 30),
        ("u2", "a", 4, 10), ("u2", "b", 5, 20),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "event_id", "ts_us"])
    out = [(r["path"], r["n"]) for r in top_event_paths(df, depth=2, k=10).collect()]
    # a>b appears twice; b>c once; tie-free ordering by (n desc, path)
    assert out == [("a>b", 2), ("b>c", 1)]


def test_funnel_and_paths_reject_degenerate_params(spark):
    from polars_quant_spark.operators.events import funnel_step_times, top_event_paths

    df = _events(spark, [("u", "a", 1)])
    with pytest.raises(ValueError):
        funnel_step_times(df, [])
    with pytest.raises(ValueError):
        top_event_paths(df.withColumn("event_id", df.ts_us), depth=1)


def test_lifespan_survival_rejects_empty_grid(spark):
    from polars_quant_spark.operators.events import lifespan_survival

    with pytest.raises(ValueError):
        lifespan_survival(_user_days(spark, [("u", 1)]), ks=())


def test_cohort_period_guards(spark):
    """period/horizon are interpolated into SQL expressions — degenerate
    values must raise, not emit NULL-keyed garbage (round-10 review)."""
    from polars_quant_spark.operators.events import cohort_ltv, cohort_retention

    ud = _user_days(spark, [("u", 1)])
    with pytest.raises(ValueError):
        cohort_retention(ud, period=0)
    money = spark.createDataFrame([("u", 1, 5)], ["user_id", "day", "cents"])
    with pytest.raises(ValueError):
        cohort_ltv(money, period=-7)
    with pytest.raises(ValueError):
        cohort_ltv(money, horizon=-1)
