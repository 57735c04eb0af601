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

__all__ = [
    "differentiable_search",
    "hierarchical_forward",
    "softmax_temperature",
    "QueryMode",
    "RuvectorQuery",
    "QueryResult",
    "SubGraph",
    "execute_query",
]
