"""Access-frequency-tiered embedding compression.

Reference: ruvector-gnn/src/compress.rs — CompressionLevel selected by
access frequency (hot > 0.8 keeps f32, warm half-precision, cool PQ8, cold
PQ4 + outliers, archive <= 0.01 binary; :15-33) with CompressedTensor
variants (:37-70) and TensorCompress::compress (:102).

TPU mapping: Half = bfloat16 (native), PQ via ops.quantization codebooks,
binary via packed uint32 signs. Compression policy is host logic; the
compressed stores are device arrays usable directly by distance kernels.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ruvector_tpu.ops.quantization import (
    BinaryQuantized,
    PQCodebook,
    binary_quantize,
    int4_dequantize,
    int4_quantize,
    pq_decode,
    pq_encode,
    pq_train,
)


def level_for_access_frequency(freq: float) -> str:
    """Tier policy (compress.rs:15-33): hot>0.8 none, >0.5 half, >0.1 pq8,
    >0.01 pq4, else binary."""
    if freq > 0.8:
        return "none"
    if freq > 0.5:
        return "half"
    if freq > 0.1:
        return "pq8"
    if freq > 0.01:
        return "pq4"
    return "binary"


@dataclasses.dataclass
class CompressedTensor:
    level: str
    payload: Any
    dim: int

    @property
    def bytes_per_vector(self) -> float:
        if self.level == "none":
            return self.dim * 4
        if self.level == "half":
            return self.dim * 2
        if self.level == "pq8":
            cb: PQCodebook = self.payload["codebook"]
            return cb.subvectors
        if self.level == "pq4":
            return self.payload["int4"].packed.shape[1]
        if self.level == "binary":
            return self.payload.bits.shape[1] * 4
        raise ValueError(self.level)


class TensorCompress:
    """Compress / decompress batches of embeddings by tier."""

    def __init__(self, pq_subvectors: int = 8, pq_centroids: int = 256):
        self.pq_subvectors = pq_subvectors
        self.pq_centroids = pq_centroids

    def compress(self, data, access_frequency: float) -> CompressedTensor:
        x = jnp.asarray(data, jnp.float32)
        level = level_for_access_frequency(access_frequency)
        return self.compress_level(x, level)

    def compress_level(self, x: jax.Array, level: str) -> CompressedTensor:
        n, d = x.shape
        if level == "none":
            return CompressedTensor("none", x, d)
        if level == "half":
            return CompressedTensor("half", x.astype(jnp.bfloat16), d)
        if level == "pq8":
            cb = pq_train(np.asarray(x), self.pq_subvectors,
                          min(self.pq_centroids, n))
            codes = pq_encode(cb, x)
            return CompressedTensor("pq8", {"codebook": cb, "codes": codes}, d)
        if level == "pq4":
            # 4-bit scalar + outlier list (top-|x| values kept exact)
            q = int4_quantize(x)
            dec = int4_dequantize(q)
            err = jnp.abs(x - dec)
            thresh = jnp.percentile(err, 99.0)
            outlier_mask = np.asarray(err > thresh)
            idx = np.argwhere(outlier_mask)
            vals = np.asarray(x)[outlier_mask]
            return CompressedTensor(
                "pq4", {"int4": q, "outlier_idx": idx, "outlier_val": vals}, d
            )
        if level == "binary":
            return CompressedTensor("binary", binary_quantize(x), d)
        raise ValueError(f"unknown level {level}")

    def decompress(self, t: CompressedTensor) -> jax.Array:
        if t.level == "none":
            return t.payload
        if t.level == "half":
            return t.payload.astype(jnp.float32)
        if t.level == "pq8":
            return pq_decode(t.payload["codebook"], t.payload["codes"])
        if t.level == "pq4":
            dec = np.array(int4_dequantize(t.payload["int4"]))
            idx, vals = t.payload["outlier_idx"], t.payload["outlier_val"]
            if len(idx):
                dec[idx[:, 0], idx[:, 1]] = vals
            return jnp.asarray(dec)
        if t.level == "binary":
            b: BinaryQuantized = t.payload
            # sign reconstruction at unit scale
            words = b.bits[:, :, None] >> jnp.arange(32, dtype=jnp.uint32)[None, None, :]
            bits = (words & 1).reshape(b.bits.shape[0], -1)[:, : b.dim]
            return bits.astype(jnp.float32) * 2.0 - 1.0
        raise ValueError(t.level)
