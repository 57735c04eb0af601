"""Witness logging: deterministic audit hashes of device tensors.

Reference: ruvector-attn-mincut/src/witness.rs (SHA-256 tensor hashing) and
the gated transformer's per-inference Witness records (packets.rs,
model.rs:640). Witnesses double as the determinism test surface: same
inputs ⇒ identical hash chain (SURVEY.md §5 tracing).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json

import numpy as np


def tensor_witness(*arrays) -> str:
    """sha256 over the concatenated raw bytes of the given tensors."""
    h = hashlib.sha256()
    for a in arrays:
        arr = np.asarray(a)
        h.update(str(arr.shape).encode())
        h.update(str(arr.dtype).encode())
        h.update(np.ascontiguousarray(arr).tobytes())
    return h.hexdigest()


@dataclasses.dataclass
class WitnessRecord:
    step: int
    label: str
    tensor_hash: str
    prev_hash: str
    chain_hash: str
    meta: dict


class WitnessLog:
    """Append-only hash-chained witness log."""

    def __init__(self):
        self.records: list[WitnessRecord] = []
        self._chain = "genesis"

    def record(self, label: str, *arrays, **meta) -> WitnessRecord:
        th = tensor_witness(*arrays)
        payload = json.dumps(
            {"label": label, "hash": th, "prev": self._chain,
             "meta": {k: str(v) for k, v in sorted(meta.items())}},
            sort_keys=True,
        )
        chain = hashlib.sha256(payload.encode()).hexdigest()
        rec = WitnessRecord(
            step=len(self.records), label=label, tensor_hash=th,
            prev_hash=self._chain, chain_hash=chain, meta=meta,
        )
        self._chain = chain
        self.records.append(rec)
        return rec

    @property
    def head(self) -> str:
        return self._chain

    def verify(self) -> bool:
        """Re-derive the chain; True iff untampered."""
        chain = "genesis"
        for rec in self.records:
            if rec.prev_hash != chain:
                return False
            payload = json.dumps(
                {"label": rec.label, "hash": rec.tensor_hash, "prev": chain,
                 "meta": {k: str(v) for k, v in sorted(rec.meta.items())}},
                sort_keys=True,
            )
            chain = hashlib.sha256(payload.encode()).hexdigest()
            if rec.chain_hash != chain:
                return False
        return True
