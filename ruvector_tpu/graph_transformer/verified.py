"""Verified training: delta-apply steps with invariant checks + certificates.

Reference: ruvector-graph-transformer/src/verified_training.rs — invariants
(:85-151: LossStabilityBound, PermutationEquivariance, LipschitzBound,
WeightNormBound, EnergyGate), VerifiedTrainer with fail-closed delta-apply
(:343-580), sealed TrainingCertificate (:580-612).

TPU design: the candidate update is computed jitted; invariant checks read
back a handful of scalars (loss, grad norm, weight norms, equivariance
deviation) — tiny transfers — and the commit/rollback decision is host
logic. Certificates hash the step records (sha256 chain), reproducible
because every randomized check uses a bound seed.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax


# --- invariants -------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class LossStabilityBound:
    """Loss within spike_cap of its EMA; grad/step norms bounded
    (verified_training.rs:93-101)."""

    spike_cap: float = 0.5
    max_gradient_norm: float = 100.0
    max_step_size: float = 10.0
    name: str = "loss_stability_bound"


@dataclasses.dataclass(frozen=True)
class WeightNormBound:
    max_norm: float = 1000.0
    name: str = "weight_norm_bound"


@dataclasses.dataclass(frozen=True)
class LipschitzBound:
    tolerance: float = 100.0
    max_power_iterations: int = 8
    name: str = "lipschitz_bound"


@dataclasses.dataclass(frozen=True)
class PermutationEquivariance:
    rng_seed: int = 42
    tolerance: float = 1e-3
    name: str = "permutation_equivariance"


@dataclasses.dataclass(frozen=True)
class EnergyGateInvariant:
    energy_threshold: float = 1e-8
    name: str = "energy_gate"


TrainingInvariant = (
    LossStabilityBound | WeightNormBound | LipschitzBound
    | PermutationEquivariance | EnergyGateInvariant
)


@dataclasses.dataclass
class InvariantCheckResult:
    name: str
    passed: bool
    value: float
    threshold: float


@dataclasses.dataclass
class TrainingStepResult:
    step: int
    loss: float
    committed: bool
    checks: list[InvariantCheckResult]

    def record_hash(self, prev_hash: str) -> str:
        payload = json.dumps({
            "step": self.step, "loss": round(self.loss, 8),
            "committed": self.committed,
            "checks": [(c.name, c.passed, round(c.value, 8)) for c in self.checks],
            "prev": prev_hash,
        }, sort_keys=True)
        return hashlib.sha256(payload.encode()).hexdigest()


@dataclasses.dataclass
class TrainingCertificate:
    steps: int
    committed_steps: int
    total_violations: int
    final_weights_hash: str
    chain_hash: str
    invariants: list[str]


# --- trainer ----------------------------------------------------------------

class VerifiedTrainer:
    """Wraps a (loss_fn, optimizer) pair with fail-closed verified steps.

    loss_fn(params, batch) -> scalar loss. Each step computes the candidate
    update, checks every invariant on the PROPOSED state, and commits only
    when all pass (delta-apply, verified_training.rs:409+).
    """

    def __init__(
        self,
        loss_fn: Callable,
        optimizer: optax.GradientTransformation,
        params: Any,
        invariants: list[TrainingInvariant],
        forward_fn: Callable | None = None,   # for equivariance checks
    ):
        self.loss_fn = loss_fn
        self.optimizer = optimizer
        self.params = params
        self.opt_state = optimizer.init(params)
        self.invariants = invariants
        self.forward_fn = forward_fn
        self.step_count = 0
        self.loss_ema: float | None = None
        self.loss_ema_alpha = 0.1
        self.step_results: list[TrainingStepResult] = []
        self.total_violations = 0

        @jax.jit
        def candidate_step(params, opt_state, batch):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            updates, new_opt_state = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            gnorm = optax.global_norm(grads)
            unorm = optax.global_norm(updates)
            wnorm = optax.global_norm(new_params)
            return loss, new_params, new_opt_state, gnorm, unorm, wnorm

        self._candidate_step = candidate_step

    # -- invariant evaluation -------------------------------------------------

    def _check(self, inv, loss, gnorm, unorm, wnorm, new_params,
               batch) -> InvariantCheckResult:
        if isinstance(inv, LossStabilityBound):
            ema = self.loss_ema if self.loss_ema is not None else loss
            spike = (loss - ema) / max(abs(ema), 1e-12)
            ok = (spike <= inv.spike_cap
                  and gnorm <= inv.max_gradient_norm
                  and unorm <= inv.max_step_size)
            return InvariantCheckResult(inv.name, ok, float(spike), inv.spike_cap)
        if isinstance(inv, WeightNormBound):
            return InvariantCheckResult(
                inv.name, wnorm <= inv.max_norm, float(wnorm), inv.max_norm
            )
        if isinstance(inv, LipschitzBound):
            lip = self._estimate_lipschitz(new_params, inv.max_power_iterations)
            return InvariantCheckResult(
                inv.name, lip <= inv.tolerance, float(lip), inv.tolerance
            )
        if isinstance(inv, PermutationEquivariance):
            dev = self._equivariance_deviation(new_params, batch, inv.rng_seed)
            return InvariantCheckResult(
                inv.name, dev <= inv.tolerance, float(dev), inv.tolerance
            )
        if isinstance(inv, EnergyGateInvariant):
            energy = float(gnorm) ** 2
            return InvariantCheckResult(
                inv.name, energy >= inv.energy_threshold, energy,
                inv.energy_threshold,
            )
        raise TypeError(f"unknown invariant {inv}")

    def _estimate_lipschitz(self, params, iters: int) -> float:
        """Product of per-matrix spectral norms (power iteration)."""
        total = 1.0
        for leaf in jax.tree_util.tree_leaves(params):
            a = np.asarray(leaf)
            if a.ndim != 2:
                continue
            v = np.ones(a.shape[1]) / np.sqrt(a.shape[1])
            for _ in range(iters):
                w = a.T @ (a @ v)
                n = np.linalg.norm(w)
                if n < 1e-12:
                    break
                v = w / n
            total *= float(np.linalg.norm(a @ v))
        return total

    def _equivariance_deviation(self, params, batch, seed: int) -> float:
        """||P^-1 f(P x) - f(x)|| / ||f(x)|| with a seeded permutation.

        Requires forward_fn(params, features) operating row-wise-equivariant
        over nodes; returns 0.0 when no forward_fn was provided.
        """
        if self.forward_fn is None:
            return 0.0
        feats = batch["features"] if isinstance(batch, dict) else batch
        x = np.asarray(feats)
        perm = np.random.default_rng(seed).permutation(x.shape[0])
        out = np.asarray(self.forward_fn(params, jnp.asarray(x)))
        out_p = np.asarray(self.forward_fn(params, jnp.asarray(x[perm])))
        inv = np.empty_like(perm)
        inv[perm] = np.arange(len(perm))
        dev = np.linalg.norm(out_p[inv] - out)
        return float(dev / max(np.linalg.norm(out), 1e-12))

    # -- step -----------------------------------------------------------------

    def train_step(self, batch) -> TrainingStepResult:
        loss, new_params, new_opt_state, gnorm, unorm, wnorm = \
            self._candidate_step(self.params, self.opt_state, batch)
        loss = float(loss)
        gnorm, unorm, wnorm = float(gnorm), float(unorm), float(wnorm)

        checks = [
            self._check(inv, loss, gnorm, unorm, wnorm, new_params, batch)
            for inv in self.invariants
        ]
        committed = bool(all(c.passed for c in checks) and np.isfinite(loss))
        if committed:
            self.params = new_params
            self.opt_state = new_opt_state
            self.loss_ema = (
                loss if self.loss_ema is None
                else (1 - self.loss_ema_alpha) * self.loss_ema
                + self.loss_ema_alpha * loss
            )
        else:
            self.total_violations += sum(not c.passed for c in checks)

        self.step_count += 1
        result = TrainingStepResult(self.step_count, loss, committed, checks)
        self.step_results.append(result)
        return result

    def seal(self) -> TrainingCertificate:
        """Compose the certificate: sha256 chain over step records + final
        weights hash (verified_training.rs:580-612)."""
        chain = "genesis"
        for r in self.step_results:
            chain = r.record_hash(chain)
        flat = np.concatenate([
            np.asarray(l).reshape(-1)
            for l in jax.tree_util.tree_leaves(self.params)
        ])
        wh = hashlib.sha256(flat.tobytes()).hexdigest()
        return TrainingCertificate(
            steps=self.step_count,
            committed_steps=sum(r.committed for r in self.step_results),
            total_violations=self.total_violations,
            final_weights_hash=wh,
            chain_hash=chain,
            invariants=[inv.name for inv in self.invariants],
        )

    @property
    def latest_loss(self) -> float | None:
        return self.step_results[-1].loss if self.step_results else None
