"""Multi-host bring-up + elastic checkpoint/restart.

Reference mapping (SURVEY §2.2): raft/gossip/replication drop out of the
data plane — multi-controller JAX has no leader to elect. What remains:
- process bring-up: jax.distributed.initialize (the coordinator barrier
  replaces gossip membership, gossip.rs:108-311)
- elasticity: checkpoint + restart (failover.rs quorum logic is replaced by
  the scheduler restarting failed workers from the last checkpoint)
- liveness: a heartbeat file the job scheduler can watch.
"""

from __future__ import annotations

import dataclasses
import os
import time
from pathlib import Path

import jax

from ruvector_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
):
    """Bring up the multi-host runtime. No-ops on a single process.

    On TPU pods the three arguments come from the environment
    automatically; on GPU/CPU clusters pass them explicitly.
    """
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if num_processes is None or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


@dataclasses.dataclass
class TrainStateCheckpointer:
    """Periodic checkpoint + resume for the training loop (the elasticity
    mechanism: any worker failure -> restart -> resume from last step)."""

    directory: str | Path
    every_steps: int = 100
    keep: int = 2
    _saved_steps: list = dataclasses.field(default_factory=list)

    def maybe_save(self, step: int, state) -> bool:
        if step % self.every_steps != 0:
            return False
        # only process 0 writes (single-writer discipline)
        if jax.process_index() != 0:
            return False
        save_checkpoint(self.directory, state, step=step, use_orbax=False)
        self._saved_steps.append(step)
        while len(self._saved_steps) > self.keep:
            old = self._saved_steps.pop(0)
            for suffix in (".npz", ".json"):
                p = Path(self.directory) / f"ckpt_{old}{suffix}"
                if p.exists():
                    p.unlink()
        return True

    def latest_step(self) -> int | None:
        d = Path(self.directory)
        if not d.exists():
            return None
        steps = []
        for p in d.glob("ckpt_*.npz"):
            try:
                steps.append(int(p.stem.split("_")[1]))
            except (IndexError, ValueError):
                continue
        return max(steps) if steps else None

    def restore_latest(self, target):
        """Returns (state, step) or (target, 0) when no checkpoint exists."""
        step = self.latest_step()
        if step is None:
            return target, 0
        return restore_checkpoint(self.directory, target, step=step,
                                  use_orbax=False), step


class Heartbeat:
    """Liveness file for external failure detection (the scheduler-visible
    replacement for gossip health counters)."""

    def __init__(self, path: str | Path, interval_s: float = 30.0):
        self.path = Path(path)
        self.interval_s = interval_s
        self._last = 0.0

    def beat(self, step: int | None = None):
        now = time.time()
        if now - self._last < self.interval_s:
            return
        self.path.write_text(f"{now} {step if step is not None else ''}\n")
        self._last = now

    @staticmethod
    def is_alive(path: str | Path, timeout_s: float = 120.0) -> bool:
        p = Path(path)
        if not p.exists():
            return False
        try:
            ts = float(p.read_text().split()[0])
        except (ValueError, IndexError):
            return False
        return (time.time() - ts) < timeout_s
