"""Plan-inspection utilities (see plans.inspect)."""

from polars_quant_spark.plans.inspect import (  # noqa: F401
    check,
    has_cartesian,
    n_exchanges,
    n_scans,
    plan_str,
    pushed_filters,
    read_schemas,
)
