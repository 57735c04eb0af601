from ruvector_tpu.graph.neighbors import NeighborGraph
from ruvector_tpu.graph.csr import CSRGraph
from ruvector_tpu.graph.build import build_knn_graph, knn_graph_numpy
from ruvector_tpu.graph.block_dense import BlockDenseGraph, build_block_dense
from ruvector_tpu.graph.property import (
    Hyperedge,
    PropertyGraph,
    PNode,
    PEdge,
    Transaction,
    TransactionAborted,
)

__all__ = ["NeighborGraph", "CSRGraph", "build_knn_graph", "knn_graph_numpy",
           "BlockDenseGraph", "build_block_dense",
           "PropertyGraph", "PNode", "PEdge", "Hyperedge",
           "Transaction", "TransactionAborted"]
from ruvector_tpu.graph.cypher import (
    CypherEngine,
    CypherSyntaxError,
    cypher_shell,
    execute_cypher,
    parse_cypher,
)
