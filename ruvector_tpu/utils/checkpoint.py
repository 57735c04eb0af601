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
import re
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


# ---------------------------------------------------------------------------
# Async sharded checkpointing (SURVEY §5: orbax-style async checkpoint of
# sharded arrays — each process writes only its addressable shards, and the
# disk write happens on a background thread so the train loop never blocks
# on IO; at 10M x 128 + optimizer state the synchronous gather-to-host save
# above would stall every host on process 0's disk).
# ---------------------------------------------------------------------------

import threading


class AsyncShardedCheckpointer:
    """Per-process sharded checkpoint with background IO.

    save():   device->host copies of the caller's addressable shards are
              snapshotted synchronously (cheap, DMA), then serialized and
              written on a daemon thread. A step is visible to restore only
              after its meta file lands (write-then-rename commit).
    restore(): reassembles global arrays shard-by-shard onto the target
              sharding via jax.make_array_from_callback — each process
              reads only the slices it needs.
    """

    def __init__(self, directory: str | Path):
        self.directory = Path(directory)
        self.directory.mkdir(parents=True, exist_ok=True)
        self._thread: threading.Thread | None = None
        self._error: Exception | None = None

    def save(self, tree: Any, step: int = 0,
             process_index: int | None = None) -> None:
        proc = (jax.process_index() if process_index is None
                else process_index)
        flat = {}
        index_meta = {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                           for p in path)
            arr = leaf
            if isinstance(arr, jax.Array) and hasattr(arr, "addressable_shards"):
                shards = arr.addressable_shards
                for sh in shards:
                    sid = f"{key}::{sh.index}"
                    # snapshot NOW (device->host); write later
                    flat[sid] = np.asarray(sh.data)
                index_meta[key] = {
                    "global_shape": list(arr.shape),
                    "dtype": str(arr.dtype),
                    "indices": [_index_to_meta(sh.index) for sh in shards],
                }
            else:
                flat[f"{key}::()"] = np.asarray(arr)
                index_meta[key] = {
                    "global_shape": list(np.shape(arr)),
                    "dtype": str(np.asarray(arr).dtype),
                    "indices": [[]],
                }

        self.wait_until_finished()

        def write():
            try:
                tmp = self.directory / f".tmp_ckpt_{step}.proc{proc}.npz"
                final = self.directory / f"ckpt_{step}.proc{proc}.npz"
                np.savez(tmp, **flat)
                tmp.rename(final)
                meta = {"step": step, "process": proc, "keys": index_meta}
                mtmp = self.directory / f".tmp_ckpt_{step}.proc{proc}.json"
                mfinal = self.directory / f"ckpt_{step}.proc{proc}.json"
                mtmp.write_text(json.dumps(meta))
                mtmp.rename(mfinal)   # commit point
            except Exception as e:  # surfaced on next wait/save
                self._error = e

        self._thread = threading.Thread(target=write, daemon=True)
        self._thread.start()

    def wait_until_finished(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def restore(self, target: Any, step: int = 0,
                shardings: Any = None) -> Any:
        """Restore into `target`'s structure. `shardings` (optional pytree
        matching target) places each array; defaults to target's own
        shardings when target holds jax.Arrays, else host numpy."""
        import glob as _glob

        files = sorted(_glob.glob(
            str(self.directory / f"ckpt_{step}.proc*.npz")))
        if not files:
            raise FileNotFoundError(f"no sharded checkpoint for step {step}")
        data = {}
        for f in files:
            npz = np.load(f)
            for k in npz.files:
                data[k] = npz[k]
        metas = {}
        for f in sorted(_glob.glob(
                str(self.directory / f"ckpt_{step}.proc*.json"))):
            m = json.loads(Path(f).read_text())
            for k, v in m["keys"].items():
                metas[k] = v

        leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(target)
        shard_leaves = (jax.tree_util.tree_flatten(shardings)[0]
                        if shardings is not None else [None] * len(leaves_with_paths))
        new_leaves = []
        for (pth, leaf), shd in zip(leaves_with_paths, shard_leaves):
            key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                           for p in pth)
            meta = metas[key]
            shape = tuple(meta["global_shape"])
            dtype = np.dtype(meta["dtype"])
            full = np.zeros(shape, dtype)
            for k, v in data.items():
                name, _, idx = k.partition("::")
                if name != key:
                    continue
                full[_meta_to_index(idx)] = v
            if shd is None and isinstance(leaf, jax.Array) and hasattr(
                    leaf, "sharding"):
                shd = leaf.sharding
            if shd is not None:
                new_leaves.append(jax.device_put(full, shd))
            else:
                new_leaves.append(jax.numpy.asarray(full))
        return jax.tree_util.tree_unflatten(treedef, new_leaves)


def _index_to_meta(index) -> list:
    out = []
    for s in index:
        out.append([s.start, s.stop, s.step])
    return out


_SLICE_RE = re.compile(r"slice\(([^)]*)\)")


def _meta_to_index(idx_str_or_list):
    """Parse either the '(...)' repr key suffix or a meta list into slices.

    The string form is parsed structurally (regex over ``slice(a, b, c)``
    terms with int/None fields only) — archive-derived strings are never
    evaluated as Python, so a corrupted or untrusted checkpoint cannot
    inject code.
    """
    if isinstance(idx_str_or_list, str):
        s = idx_str_or_list.strip()
        if s in ("()", ""):
            return tuple()
        out = []
        for m in _SLICE_RE.finditer(s):
            parts = [p.strip() for p in m.group(1).split(",")]
            if len(parts) != 3:
                raise ValueError(f"malformed slice in shard index: {s!r}")
            vals = []
            for p in parts:
                if p == "None":
                    vals.append(None)
                else:
                    vals.append(int(p))  # raises on anything non-numeric
            out.append(slice(*vals))
        if not out:
            raise ValueError(f"unparseable shard index: {s!r}")
        return tuple(out)
    return tuple(slice(a, b, c) for a, b, c in idx_str_or_list)
