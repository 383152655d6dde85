"""Static oracle output-type gate (VERDICT r5 #2b).

DuckDB types bare SUM(INTEGER)/SUM(BIGINT) as HUGEINT, and
`duckdb.sql(...).df()` renders HUGEINT as pandas float64 — so a
value-correct oracle hashes as 2017.0 against Spark's int64 2017 and the
driver's dtype-sensitive value hash goes red while rows and schema match.
That defect class survived three rounds because the local value comparison
equated 5 == 5.0. This gate kills the class statically: DuckDB *binds*
every registered oracle (no execution needed — `.types` comes from the
binder) and we assert no output column is HUGEINT / UHUGEINT / DECIMAL.
Any future bare SUM(int) fails here in seconds, locally.
"""

from __future__ import annotations

from tests.harness import duck_con

SF_DIR = "/root/testdata/sf0.001"

# Pandas-hostile DuckDB output types: HUGEINT/UHUGEINT become float64 in
# .df(); DECIMAL becomes object/float depending on scale. Spark never emits
# these, so any oracle output column of these types is a guaranteed (or
# latent, data-dependent) driver hash mismatch.
FORBIDDEN = ("HUGEINT", "UHUGEINT", "DECIMAL")


def _oracles():
    import __spark_entry__ as entry

    return entry.oracle_sql()


def test_no_hugeint_or_decimal_oracle_outputs():
    con = duck_con(SF_DIR)
    oracles = _oracles()
    assert len(oracles) > 300, "oracle registry unexpectedly small"
    offenders: dict[str, list[tuple[str, str]]] = {}
    binder_errors: dict[str, str] = {}
    for name, sql in oracles.items():
        try:
            rel = con.sql(sql)
            cols = list(zip(rel.columns, (str(t) for t in rel.types)))
        except Exception as exc:  # pragma: no cover - bind failure is its own bug
            binder_errors[name] = str(exc)[:200]
            continue
        hits = [
            (c, t)
            for c, t in cols
            if any(bad in t.upper() for bad in FORBIDDEN)
        ]
        if hits:
            offenders[name] = hits
    assert not binder_errors, f"oracles failed to bind: {binder_errors}"
    assert not offenders, (
        "oracle output columns with pandas-hostile DuckDB types "
        f"(wrap in CAST(... AS BIGINT)): {offenders}"
    )


def test_dtype_mismatch_detector_catches_hugeint():
    """The harness-side twin: prove dtype_mismatches flags the exact shape
    that slipped through three rounds (int64 on Spark, float64 from a
    HUGEINT oracle), and stays quiet when both sides agree."""
    import pandas as pd

    from tests.harness import dtype_mismatches

    sp = pd.DataFrame({"net_advances": pd.array([5, -3], dtype="int64")})
    du_bad = pd.DataFrame({"net_advances": [5.0, -3.0]})
    assert dtype_mismatches(sp, du_bad, "mkt_breadth")

    du_ok = pd.DataFrame({"net_advances": pd.array([5, -3], dtype="int64")})
    assert not dtype_mismatches(sp, du_ok, "mkt_breadth")

    # Nulls float the int side on BOTH engines -> not driver-visible.
    sp_null = pd.DataFrame({"x": [1.0, None]})
    du_null = pd.DataFrame({"x": pd.array([1, None], dtype="Int64")})
    assert not dtype_mismatches(sp_null, du_null, "nullable")

    # bool-vs-int: Python True == 1, so only the dtype gate sees it.
    sp_bool = pd.DataFrame({"f": pd.array([True, False], dtype="bool")})
    du_int = pd.DataFrame({"f": pd.array([1, 0], dtype="int64")})
    assert dtype_mismatches(sp_bool, du_int, "boolsplit")
    du_bool = pd.DataFrame({"f": pd.array([True, False], dtype="bool")})
    assert not dtype_mismatches(sp_bool, du_bool, "boolsplit")


def test_nan_asymmetry_detector():
    """The harness's NaN gate: a column where one engine emits float NaN
    and the other NULL must fail (the value comparison maps both to None,
    so only this check sees it); symmetric NaNs and plain NULLs pass."""
    import numpy as np
    import pandas as pd

    from tests.harness import nan_asymmetries

    sp = pd.DataFrame({"r": [1.0, np.nan]})
    # a bare [1.0, None] list would coerce to float64/NaN — force the
    # object column a NULL-producing engine actually hands back
    du_null = pd.DataFrame({"r": pd.Series([1.0, None], dtype=object)})
    assert nan_asymmetries(sp, du_null, "q")

    du_nan = pd.DataFrame({"r": [1.0, np.nan]})
    assert not nan_asymmetries(sp, du_nan, "q")


def test_fixed_hugeint_queries_dtype_faithful(spark):
    """End-to-end dtype-faithful run of the 13 queries whose oracles were
    HUGEINT-red (4 driver-red in r5 + 9 latent): both value AND dtype-class
    must now match at sf0.001."""
    import __spark_entry__ as entry

    from tests.harness import compare

    FIXED = [
        "mkt_breadth",
        "mkt_breadth_ints",
        "rel_q12_priority_counts",
        "doc_bpe_merges",
        "bars_volume_profile",
        "events_props_json",
        "stream_source_quota",
        "doc_source_report",
        "doc_dedup_savings",
        "events_session_features",
        "events_activity_gini",
        "events_ab_test",
        "rel_data_profile",
    ]
    queries = entry.queries()
    oracles = entry.oracle_sql()
    con = duck_con(SF_DIR)
    errors = []
    for name in FIXED:
        df = queries[name](spark, SF_DIR)
        errors.extend(compare(df, con, oracles[name], name))
    assert not errors, errors
