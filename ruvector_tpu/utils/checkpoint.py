"""Checkpoint / resume for params, optimizer state, and sharded arrays.

Reference: ruvector-snapshot (collection backup/restore with checksums),
GNN layer serde (ruvector-gnn-node to_json/from_json), SONA safetensors
export. TPU mapping (SURVEY.md §5): orbax-style checkpoint of the training
pytree with step-resume.

Uses orbax-checkpoint when importable, with a numpy .npz fallback that
preserves the pytree structure (and thus works for any of our functional
models). Checksums (sha256 of the flat buffer) guard corruption, mirroring
ruvector-snapshot's checksum design.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path
from typing import Any

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def _flatten_with_paths(tree: Any) -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_checkpoint(directory: str | Path, tree: Any, step: int = 0,
                    use_orbax: bool | None = None) -> str:
    """Save a pytree; returns the checkpoint path."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    path = directory / f"ckpt_{step}"

    if (use_orbax if use_orbax is not None else _HAVE_ORBAX):
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path.absolute(), tree, force=True)
        ckptr.wait_until_finished()
        return str(path)

    flat = _flatten_with_paths(tree)
    checksum = hashlib.sha256(
        b"".join(v.tobytes() for _, v in sorted(flat.items()))
    ).hexdigest()
    np.savez(str(path) + ".npz", **flat)
    meta = {"step": step, "checksum": checksum, "keys": sorted(flat)}
    (directory / f"ckpt_{step}.json").write_text(json.dumps(meta))
    return str(path) + ".npz"


def restore_checkpoint(directory: str | Path, target: Any, step: int = 0,
                       use_orbax: bool | None = None) -> Any:
    """Restore into the structure of `target` (pytree prototype)."""
    directory = Path(directory)
    path = directory / f"ckpt_{step}"

    if (use_orbax if use_orbax is not None else _HAVE_ORBAX) and path.exists():
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path.absolute(), target)

    npz = np.load(str(path) + ".npz")
    meta = json.loads((directory / f"ckpt_{step}.json").read_text())
    flat = {k: npz[k] for k in npz.files}
    checksum = hashlib.sha256(
        b"".join(v.tobytes() for _, v in sorted(flat.items()))
    ).hexdigest()
    if checksum != meta["checksum"]:
        raise ValueError(f"checkpoint corrupt: checksum mismatch at {path}")

    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(target)
    new_leaves = []
    for pth, leaf in leaves_with_paths:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in pth)
        new_leaves.append(jax.numpy.asarray(flat[key]))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
