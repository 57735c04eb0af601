from ruvector_tpu.ops.segment import (
    masked_softmax,
    masked_weighted_mean,
    spmm_padded,
    sddmm_padded,
    segment_softmax_csr,
    spmm_csr,
    sddmm_csr,
)
from ruvector_tpu.ops.distance import (
    cosine_similarity,
    pairwise_cosine,
    pairwise_dot,
    pairwise_euclidean,
)

__all__ = [
    "masked_softmax",
    "masked_weighted_mean",
    "spmm_padded",
    "sddmm_padded",
    "segment_softmax_csr",
    "spmm_csr",
    "sddmm_csr",
    "cosine_similarity",
    "pairwise_cosine",
    "pairwise_dot",
    "pairwise_euclidean",
]
