"""Statistical / experimentation / audit operators (SURVEY.md §2.5
north-star extensions; no reference analogue — the reference's
relational surface is SQL shipped to Redshift, see
lib/RedshiftLoader.ts:337-393).

Split into subject modules in r13 (VERDICT r12 next-round #4) —
``descriptive`` (product analytics, sketches, robust stats),
``inference`` (association, experimentation, attribution,
forecasting), ``hypothesis`` (classical test battery, survival),
``timeseries_risk`` (drift, EVT/risk, inequality tails) — with every
registry name, helper, and constant re-exported here so
``rs_streamloader_spark.operators.stats.X`` keeps resolving for every
X the monolith exposed. ``_t``/``load_tables`` live HERE and the
submodules call them through the package at call time, so tests that
``monkeypatch.setattr(stats, "_t", ...)`` keep reaching every
operator.

Cross-engine determinism rules (same as the rest of the catalog):
integer arithmetic wherever sums feed comparisons (money in BIGINT
cents, error terms as exact integer multiples), transcendentals
(sqrt/ln/exp) only as the final scored expression with identical
operand order in both engines, global windows only over
already-reduced aggregates, and two-pass distributed prefix sums in
place of any global-sort running total over input-cardinality rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rs_streamloader_spark.session import load_tables


def _t(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return load_tables(spark, sf_dir, *names)


# import order preserves the monolith's registration order
from rs_streamloader_spark.operators.stats import descriptive as _m1  # noqa: E402
from rs_streamloader_spark.operators.stats import inference as _m2  # noqa: E402
from rs_streamloader_spark.operators.stats import hypothesis as _m3  # noqa: E402
from rs_streamloader_spark.operators.stats import timeseries_risk as _m4  # noqa: E402
from rs_streamloader_spark.operators.stats import association as _m5  # noqa: E402

# hoist every submodule name (operators, helpers, constants — including
# underscore names external code imports, e.g. _hll_cols, _SPRT_P0)
for _m in (_m1, _m2, _m3, _m4, _m5):
    for _k, _v in vars(_m).items():
        if not _k.startswith("__") and _k not in ("_S",):
            globals().setdefault(_k, _v)
del _m, _k, _v
