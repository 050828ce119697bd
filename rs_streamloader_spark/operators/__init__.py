"""Query/operator catalog.

Importing this package registers every operator module's queries into
:mod:`rs_streamloader_spark.operators.registry`.
"""

from rs_streamloader_spark.operators import (  # noqa: F401
    advanced,
    analytic,
    dedup,
    mining,
    multimodal,
    quality,
    relational,
    similarity,
    stats,
    text,
    tpch,
    webtext,
)
from rs_streamloader_spark.operators.registry import REGISTRY, QuerySpec, register
from rs_streamloader_spark.streaming import replay  # noqa: F401  (registers replay queries)

__all__ = ["REGISTRY", "QuerySpec", "register"]
