from ruvector_tpu.serve.search import (
    differentiable_search,
    hierarchical_forward,
    softmax_temperature,
)
from ruvector_tpu.serve.query import (
    QueryMode,
    RuvectorQuery,
    QueryResult,
    SubGraph,
    execute_query,
)

from ruvector_tpu.serve.sql import SqlEngine, SqlError, execute_sql

__all__ = [
    "SqlEngine",
    "SqlError",
    "execute_sql",
    "differentiable_search",
    "hierarchical_forward",
    "softmax_temperature",
    "QueryMode",
    "RuvectorQuery",
    "QueryResult",
    "SubGraph",
    "execute_query",
]
