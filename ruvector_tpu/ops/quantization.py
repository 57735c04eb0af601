"""Vector quantization: scalar int8, int4, product quantization, binary.

Reference: ruvector-core/src/quantization.rs — ScalarQuantized (:36), PQ
train/encode (:104-190), Int4Quantized (:196-285), BinaryQuantized with fast
Hamming (:289-400); asymmetric distance throughout.

TPU form: everything batched — quantize [N, D] at once, and distances are
MXU contractions (int8 dot via dot_general with int32 accumulation; binary
Hamming via XOR + popcount on uint32 lanes).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


# --- scalar int8 (4x compression) -------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ScalarQuantized:
    codes: jax.Array      # [N, D] int8
    scale: jax.Array      # [N] f32
    offset: jax.Array     # [N] f32


def scalar_quantize(x: jax.Array) -> ScalarQuantized:
    """Per-vector affine int8: c = round((x - min) / scale) - 128."""
    lo = jnp.min(x, axis=-1, keepdims=True)
    hi = jnp.max(x, axis=-1, keepdims=True)
    scale = jnp.maximum(hi - lo, 1e-12) / 255.0
    codes = jnp.clip(jnp.round((x - lo) / scale) - 128, -128, 127).astype(jnp.int8)
    return ScalarQuantized(codes, scale[..., 0], lo[..., 0])


def scalar_dequantize(q: ScalarQuantized) -> jax.Array:
    return (q.codes.astype(jnp.float32) + 128.0) * q.scale[..., None] + q.offset[..., None]


def scalar_distance(query: jax.Array, q: ScalarQuantized) -> jax.Array:
    """Asymmetric squared-L2: f32 query vs int8 database, [B, D] x N -> [B, N].

    Decompression folds into the matmul: ||q - (c·s + o)||² expands to terms
    computable from one int8 contraction (the MXU path) + per-vector scalars.
    """
    d = query.shape[-1]
    c = q.codes.astype(jnp.float32) + 128.0            # [N, D]
    # dec = c * s + o  (per row)
    dots = jnp.dot(query, c.T, preferred_element_type=jnp.float32)   # [B, N]
    c_sq = jnp.sum(c * c, axis=-1)                     # [N]
    c_sum = jnp.sum(c, axis=-1)                        # [N]
    q_sq = jnp.sum(query * query, axis=-1, keepdims=True)
    q_sum = jnp.sum(query, axis=-1, keepdims=True)
    s, o = q.scale[None, :], q.offset[None, :]
    # ||q||² - 2 q·dec + ||dec||²
    cross = s * dots + o * q_sum
    dec_sq = s * s * c_sq[None, :] + 2 * s * o * c_sum[None, :] + d * o * o
    return jnp.maximum(q_sq - 2 * cross + dec_sq, 0.0)


# --- int4 (8x) --------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Int4Quantized:
    packed: jax.Array     # [N, ceil(D/2)] uint8 — two nibbles per byte
    scale: jax.Array      # [N]
    offset: jax.Array     # [N]
    dim: int = dataclasses.field(metadata=dict(static=True))


def int4_quantize(x: jax.Array) -> Int4Quantized:
    n, d = x.shape
    lo = jnp.min(x, axis=-1, keepdims=True)
    hi = jnp.max(x, axis=-1, keepdims=True)
    scale = jnp.maximum(hi - lo, 1e-12) / 15.0
    codes = jnp.clip(jnp.round((x - lo) / scale), 0, 15).astype(jnp.uint8)
    if d % 2:
        codes = jnp.pad(codes, ((0, 0), (0, 1)))
    packed = (codes[:, 0::2] | (codes[:, 1::2] << 4)).astype(jnp.uint8)
    return Int4Quantized(packed, scale[..., 0], lo[..., 0], d)


def int4_dequantize(q: Int4Quantized) -> jax.Array:
    lo_nib = (q.packed & 0x0F).astype(jnp.float32)
    hi_nib = ((q.packed >> 4) & 0x0F).astype(jnp.float32)
    codes = jnp.stack([lo_nib, hi_nib], axis=-1).reshape(q.packed.shape[0], -1)
    codes = codes[:, : q.dim]
    return codes * q.scale[:, None] + q.offset[:, None]


# --- product quantization ---------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PQCodebook:
    codebooks: jax.Array   # [S, K, d_sub]
    dim: int = dataclasses.field(metadata=dict(static=True))

    @property
    def subvectors(self) -> int:
        return self.codebooks.shape[0]

    @property
    def sub_dim(self) -> int:
        return self.codebooks.shape[2]


def pq_train(
    data: np.ndarray, subvectors: int = 8, centroids: int = 256,
    iters: int = 10, seed: int = 0,
) -> PQCodebook:
    """Train per-subspace k-means codebooks (quantization.rs:113-160).

    Host-side numpy k-means with deterministic seeding; codebooks live on
    device for encode/distance.
    """
    x = np.asarray(data, np.float32)
    n, d = x.shape
    assert d % subvectors == 0, "dim must divide into subvectors"
    ds = d // subvectors
    k = min(centroids, n)
    rng = np.random.default_rng(seed)
    books = np.zeros((subvectors, k, ds), np.float32)
    for s in range(subvectors):
        sub = x[:, s * ds : (s + 1) * ds]
        cent = sub[rng.choice(n, size=k, replace=False)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cent[None]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for c in range(k):
                pts = sub[assign == c]
                if len(pts):
                    cent[c] = pts.mean(0)
        books[s] = cent
    return PQCodebook(jnp.asarray(books), d)


@jax.jit
def pq_encode(cb: PQCodebook, x: jax.Array) -> jax.Array:
    """[N, D] -> [N, S] uint8 codes (nearest centroid per subspace)."""
    n, d = x.shape
    s, k, ds = cb.codebooks.shape
    sub = x.reshape(n, s, ds)
    d2 = jnp.sum(
        (sub[:, :, None, :] - cb.codebooks[None]) ** 2, axis=-1
    )                                                   # [N, S, K]
    return jnp.argmin(d2, axis=-1).astype(jnp.uint8)


@jax.jit
def pq_decode(cb: PQCodebook, codes: jax.Array) -> jax.Array:
    s = cb.subvectors
    gathered = jax.vmap(
        lambda si: cb.codebooks[si, codes[:, si]], out_axes=1
    )(jnp.arange(s))                                    # [N, S, ds]
    return gathered.reshape(codes.shape[0], cb.dim)


def pq_distance(cb: PQCodebook, query: jax.Array, codes: jax.Array) -> jax.Array:
    """Asymmetric PQ distance (ADC) [B, N]: per-subspace query-to-centroid
    tables contracted against one-hot codes — an MXU matmul."""
    b = query.shape[0]
    s, k, ds = cb.codebooks.shape
    qs = query.reshape(b, s, ds)
    tables = jnp.sum((qs[:, :, None, :] - cb.codebooks[None]) ** 2, axis=-1)  # [B,S,K]
    one_hot = jax.nn.one_hot(codes.astype(jnp.int32), k, dtype=tables.dtype)  # [N,S,K]
    return jnp.einsum("bsk,nsk->bn", tables, one_hot)


# --- binary (32x) -----------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BinaryQuantized:
    bits: jax.Array       # [N, ceil(D/32)] uint32
    dim: int = dataclasses.field(metadata=dict(static=True))


def binary_quantize(x: jax.Array, threshold: float = 0.0) -> BinaryQuantized:
    n, d = x.shape
    pad = (-d) % 32
    b = (x > threshold).astype(jnp.uint32)
    if pad:
        b = jnp.pad(b, ((0, 0), (0, pad)))
    words = b.reshape(n, -1, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    packed = jnp.sum(words << shifts[None, None, :], axis=-1, dtype=jnp.uint32)
    return BinaryQuantized(packed, d)


@jax.jit
def hamming_distance(a: BinaryQuantized, b: BinaryQuantized) -> jax.Array:
    """[Na, W] x [Nb, W] -> [Na, Nb] popcount(xor) distances."""
    x = a.bits[:, None, :] ^ b.bits[None, :, :]
    # popcount via bit tricks on uint32
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    pop = (x * 0x01010101) >> 24
    return jnp.sum(pop, axis=-1).astype(jnp.int32)


def binary_similarity(a: BinaryQuantized, b: BinaryQuantized) -> jax.Array:
    """1 - hamming/dim (quantization.rs:378-383)."""
    return 1.0 - hamming_distance(a, b).astype(jnp.float32) / a.dim
