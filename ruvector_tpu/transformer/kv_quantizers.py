"""Named KV-cache quantizers: KVQuant (pre-RoPE keys) and SQuat
(subspace-orthogonal), complementing the KIVI scheme in kv_cache.py.

Reference: ruvector-mincut-gated-transformer/src/kv_cache/ —
kvquant.rs: quantize keys BEFORE RoPE (pre-RoPE keys have smaller dynamic
range; RoPE is applied lazily at attention time), 3-bit keys, values
uniform or non-uniform with outlier bins; squat.rs: project KV onto
orthogonal subspaces (decorrelation), quantize each subspace with its own
scale/zero-point — extra 2.2-2.8x beyond KIVI.

TPU design: everything is batched jnp math. Quantized payloads live as
int8 arrays (one value per component; the 3-bit/4-bit width shows up in
the level count, with bit-packing delegated to ops/temporal_tensor when
tensors move to the archive tier). Basis matrices for SQuat come from an
eigendecomposition of a calibration covariance — "learned orthogonal
bases" the linear-algebra way, on the MXU.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# KVQuant (kvquant.rs)
# --------------------------------------------------------------------------

@dataclasses.dataclass
class KVQuantized:
    q: jax.Array            # int8 codes in [-(2^(b-1)), 2^(b-1)-1]
    scale: jax.Array        # per-channel scales [d]
    bits: int
    pre_rope: bool


def kvquant_quantize_keys(keys: jax.Array, bits: int = 3,
                          pre_rope: bool = True) -> KVQuantized:
    """Per-channel symmetric quantization of keys [t, d]. Call on PRE-RoPE
    keys (kvquant.rs PreRoPE mode): their per-channel dynamic range is
    narrower, so the same bit budget loses less."""
    qmax = (1 << (bits - 1)) - 1
    scale = jnp.maximum(jnp.max(jnp.abs(keys), axis=0), 1e-8) / qmax
    q = jnp.clip(jnp.round(keys / scale), -qmax - 1, qmax).astype(jnp.int8)
    return KVQuantized(q=q, scale=scale, bits=bits, pre_rope=pre_rope)


def kvquant_dequantize_keys(kq: KVQuantized) -> jax.Array:
    return kq.q.astype(jnp.float32) * kq.scale


def kvquant_attention_scores(query_rotated, kq: KVQuantized, cos_t, sin_t,
                             positions):
    """Scores against a pre-RoPE-quantized key cache: dequantize, THEN
    apply RoPE at the keys' stored positions (deferred rotation,
    kvquant.rs 'Apply RoPE during attention')."""
    from ruvector_tpu.attention.rope import rope_rotate

    keys = kvquant_dequantize_keys(kq)
    keys_rot = rope_rotate(keys, positions, cos_t, sin_t)
    d = keys.shape[-1]
    return (keys_rot @ query_rotated) / jnp.sqrt(jnp.asarray(d, jnp.float32))


@dataclasses.dataclass
class NonUniformValues:
    q: jax.Array            # int8 codes for inliers
    scale: jax.Array        # per-token scales [t]
    outlier_mask: jax.Array  # [t, d] bool
    outlier_vals: jax.Array  # [t, d] f32 (zeros where not outlier)
    bits: int


def kvquant_quantize_values(values: jax.Array, bits: int = 4,
                            outlier_percentile: float = 99.0
                            ) -> NonUniformValues:
    """Non-uniform value quantization (kvquant.rs NonUniform): the top
    |v| percentile stays exact f32; the rest is per-token uniform."""
    thresh = jnp.percentile(jnp.abs(values), outlier_percentile)
    mask = jnp.abs(values) > thresh
    inliers = jnp.where(mask, 0.0, values)
    qmax = (1 << (bits - 1)) - 1
    scale = jnp.maximum(jnp.max(jnp.abs(inliers), axis=-1), 1e-8) / qmax
    q = jnp.clip(jnp.round(inliers / scale[:, None]), -qmax - 1,
                 qmax).astype(jnp.int8)
    return NonUniformValues(q=q, scale=scale, outlier_mask=mask,
                            outlier_vals=jnp.where(mask, values, 0.0),
                            bits=bits)


def kvquant_dequantize_values(nv: NonUniformValues) -> jax.Array:
    dec = nv.q.astype(jnp.float32) * nv.scale[:, None]
    return jnp.where(nv.outlier_mask, nv.outlier_vals, dec)


# --------------------------------------------------------------------------
# SQuat (squat.rs)
# --------------------------------------------------------------------------

@dataclasses.dataclass
class SQuatBasis:
    basis: jax.Array        # [d, d] orthogonal (columns = directions)
    num_subspaces: int
    bits: int


@dataclasses.dataclass
class SQuatCompressed:
    codes: jax.Array        # int8 [t, d] (per-subspace-quantized coords)
    scales: jax.Array       # [num_subspaces]
    zeros: jax.Array        # [num_subspaces]


def squat_learn_basis(calibration: jax.Array, num_subspaces: int = 4,
                      bits: int = 4) -> SQuatBasis:
    """Orthogonal basis from the calibration covariance eigenvectors —
    decorrelates components so each subspace quantizes tighter
    (squat.rs 'learned orthogonal bases')."""
    x = calibration - jnp.mean(calibration, axis=0)
    cov = (x.T @ x) / x.shape[0]
    _, vecs = jnp.linalg.eigh(cov)
    return SQuatBasis(basis=vecs, num_subspaces=num_subspaces, bits=bits)


def squat_quantize(kv: jax.Array, basis: SQuatBasis) -> SQuatCompressed:
    """Project [t, d] onto the orthogonal basis, quantize each contiguous
    subspace with its own scale/zero-point (squat.rs quantize :256)."""
    t, d = kv.shape
    ns = basis.num_subspaces
    proj = kv @ basis.basis                       # decorrelated coords
    sub = proj.reshape(t, ns, d // ns)
    lo = jnp.min(sub, axis=(0, 2))
    hi = jnp.max(sub, axis=(0, 2))
    levels = (1 << basis.bits) - 1
    scale = jnp.maximum(hi - lo, 1e-8) / levels
    codes = jnp.clip(jnp.round((sub - lo[None, :, None])
                               / scale[None, :, None]), 0, levels)
    return SQuatCompressed(codes=codes.reshape(t, d).astype(jnp.int8),
                           scales=scale, zeros=lo)


def squat_dequantize(c: SQuatCompressed, basis: SQuatBasis) -> jax.Array:
    t, d = c.codes.shape
    ns = basis.num_subspaces
    sub = c.codes.reshape(t, ns, d // ns).astype(jnp.float32)
    proj = sub * c.scales[None, :, None] + c.zeros[None, :, None]
    return proj.reshape(t, d) @ basis.basis.T


def squat_compression_ratio(basis: SQuatBasis, dim: int) -> float:
    """Bytes vs FP16 (squat.rs compression_ratio), counting the packed
    bit width (storage packs via ops/temporal_tensor at archive time)."""
    payload_bits = dim * basis.bits + basis.num_subspaces * 64
    return (dim * 16) / payload_bits
