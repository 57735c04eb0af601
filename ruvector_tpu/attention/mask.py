"""Sparse attention mask builder: composable band/block/global patterns.

Reference: ruvector-attention/src/sparse/mask.rs — COO SparseMaskBuilder
feeding the sparse attention family (Longformer local+global windows,
block-sparse, dilated bands).

TPU form: masks are DENSE boolean [S, S] arrays — on TPU a boolean mask
folded into the softmax is free (it fuses into the score computation),
whereas gather-based COO attention is not. The builder composes patterns
with |= on device; `to_coo` exports the COO edge list for interop with
the CSR/SpMM path when sparsity is high enough to pay for gathers.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class SparseMaskBuilder:
    """Compose attention patterns into one [S, S] boolean mask."""

    def __init__(self, seq_len: int):
        self.seq_len = seq_len
        self.mask = jnp.zeros((seq_len, seq_len), bool)

    def add_local_window(self, window: int, dilation: int = 1):
        """Band of width `window` around the diagonal (Longformer local)."""
        i = jnp.arange(self.seq_len)
        delta = i[:, None] - i[None, :]
        band = (jnp.abs(delta) <= window * dilation)
        if dilation > 1:
            band = band & (delta % dilation == 0)
        self.mask = self.mask | band
        return self

    def add_global_tokens(self, token_ids):
        """Rows+columns fully attended (Longformer global)."""
        ids = jnp.asarray(token_ids)
        sel = jnp.zeros((self.seq_len,), bool).at[ids].set(True)
        self.mask = self.mask | sel[:, None] | sel[None, :]
        return self

    def add_block_diagonal(self, block_size: int):
        """Block-sparse: full attention inside fixed-size blocks."""
        blk = jnp.arange(self.seq_len) // block_size
        self.mask = self.mask | (blk[:, None] == blk[None, :])
        return self

    def add_strided(self, stride: int):
        """Every stride-th column visible to every row (BigBird-style)."""
        cols = (jnp.arange(self.seq_len) % stride) == 0
        self.mask = self.mask | cols[None, :]
        return self

    def add_causal(self):
        self.mask = self.mask & jnp.tril(
            jnp.ones((self.seq_len, self.seq_len), bool))
        return self

    def build(self) -> jnp.ndarray:
        return self.mask

    def density(self) -> float:
        return float(jnp.mean(self.mask))

    def to_coo(self) -> tuple[np.ndarray, np.ndarray]:
        """(rows, cols) of allowed positions — the reference's COO form."""
        r, c = np.nonzero(np.asarray(self.mask))
        return r.astype(np.int32), c.astype(np.int32)
