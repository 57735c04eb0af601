"""Temporal graph transformer: causal attention + Granger causality.

Reference: ruvector-graph-transformer/src/temporal.rs —
CausalGraphTransformer (:105): temporal attention over an event sequence
with a strict causal mask (forward :162, temporal_attention :319),
granger_causality (:389): does series X help predict series Y beyond Y's
own history, via VAR residual-variance ratio; verify_causal_ordering
(:460) checks the attention matrix is lower-triangular.

TPU notes: causal masking is the standard -inf upper-triangle trick; the
Granger VAR fits are small least-squares problems solved with
jnp.linalg.lstsq — batched over lag windows built by gather, no Python
loops over time."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class TemporalConfig:
    max_lag: int = 4
    significance_ratio: float = 1.05   # var(restricted)/var(full) > this => causal


@jax.jit
def temporal_attention(sequence):
    """Causal self-attention over [t, d] events (temporal.rs:319): scores
    QK^T/sqrt(d) with future positions masked to -inf. Returns
    (output [t, d], weights [t, t])."""
    x = jnp.asarray(sequence, jnp.float32)
    t, d = x.shape
    scores = (x @ x.T) / jnp.sqrt(jnp.asarray(d, jnp.float32))
    causal = jnp.tril(jnp.ones((t, t)))
    scores = jnp.where(causal > 0, scores, -jnp.inf)
    w = jax.nn.softmax(scores, axis=-1)
    return w @ x, w


def verify_causal_ordering(weights, atol: float = 1e-6) -> bool:
    """True iff no attention mass flows from the future (temporal.rs:460)."""
    w = np.asarray(weights)
    return bool(np.all(np.triu(w, k=1) <= atol))


def _lag_matrix(series, max_lag: int):
    """[t] -> ([t - max_lag, max_lag] lagged predictors, [t - max_lag] targets)."""
    t = series.shape[0]
    rows = jnp.arange(t - max_lag)[:, None] + jnp.arange(max_lag)[None, :]
    return series[rows], series[max_lag:]


def granger_causality(x, y, max_lag: int = 4) -> tuple[float, bool]:
    """Does x Granger-cause y? (temporal.rs:389)

    Fits y_t ~ lags(y) (restricted) and y_t ~ lags(y) + lags(x) (full);
    returns (variance ratio restricted/full, causal?). Ratio >> 1 means
    x's history genuinely improves the prediction of y."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)

    @jax.jit
    def fit():
        ylags, target = _lag_matrix(y, max_lag)
        xlags, _ = _lag_matrix(x, max_lag)
        ones = jnp.ones((target.shape[0], 1))
        restricted = jnp.concatenate([ones, ylags], axis=1)
        full = jnp.concatenate([ones, ylags, xlags], axis=1)

        def resid_var(a):
            coef, _, _, _ = jnp.linalg.lstsq(a, target)
            r = target - a @ coef
            return jnp.mean(r * r)

        return resid_var(restricted), resid_var(full)

    vr, vf = fit()
    ratio = float(vr / jnp.maximum(vf, 1e-12))
    return ratio, ratio > TemporalConfig().significance_ratio


def granger_matrix(series, max_lag: int = 4) -> np.ndarray:
    """Pairwise Granger ratios for [k, t] series -> [k, k] (i causes j)."""
    k = series.shape[0]
    out = np.zeros((k, k))
    for i in range(k):
        for j in range(k):
            if i != j:
                out[i, j], _ = granger_causality(series[i], series[j],
                                                 max_lag)
    return out
