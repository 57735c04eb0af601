from ruvector_tpu.index.hnsw import HnswIndex, HnswConfig
from ruvector_tpu.index.vector_db import VectorDB, DbOptions, SearchResult
from ruvector_tpu.index.hyperbolic_hnsw import HyperbolicIndex

__all__ = [
    "HnswIndex",
    "HnswConfig",
    "VectorDB",
    "DbOptions",
    "SearchResult",
    "HyperbolicIndex",
    "FilterExpression",
    "PayloadIndex",
    "filter_matches",
    "parse_qdrant_filter",
]
from ruvector_tpu.index.filter import (
    FilterExpression,
    PayloadIndex,
    matches as filter_matches,
    parse_qdrant_filter,
)
