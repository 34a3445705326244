"""Checkpoint save/load with the reference's contract.

The reference saves ``{student, teacher, stu_optimizer, lr_scheduler, epoch,
args}`` under ``best_pt.pth`` / ``best.pth`` when target-'all' PCK improves
(train_human.py:226-237); resume restores everything except the teacher-EMA
optimizer (:153-160). Here the same dict shape is serialized with flax
msgpack (arrays are numpy-compatible pytrees); filenames keep the ``.pth``
suffix so the CLI surface and log tooling stay unchanged.

``load_checkpoint`` also accepts reference *torch* checkpoints transparently
(for --pretrain/--resume against upstream artifacts) by converting state
dicts through tools/port_torch_weights when the file is a torch zipfile.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import flax.serialization
import jax
import numpy as np


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _sanitize(obj):
    """Deep-convert to msgpack-friendly types: tuples/namedtuples -> lists or
    state dicts, device arrays -> numpy, odd leaves -> str."""
    if isinstance(obj, dict):
        return {str(k): _sanitize(v) for k, v in obj.items()}
    if hasattr(obj, "_fields"):  # namedtuple (optax states)
        return {k: _sanitize(v) for k, v in zip(obj._fields, obj)}
    if isinstance(obj, (list, tuple)):
        return [_sanitize(v) for v in obj]
    if isinstance(obj, (jax.Array, np.ndarray)):
        return np.asarray(obj)
    if isinstance(obj, (str, bytes, bool, int, float)) or obj is None:
        return obj
    if isinstance(obj, (np.integer, np.floating)):
        return obj.item()
    return str(obj)


def save_checkpoint(path: str, payload: Dict[str, Any]):
    """Serialize a checkpoint dict (pytrees + scalars + plain data)."""
    payload = dict(payload)
    if "stu_optimizer" in payload and payload["stu_optimizer"] is not None:
        payload["stu_optimizer"] = flax.serialization.to_state_dict(
            payload["stu_optimizer"])
    if "args" in payload and payload["args"] is not None \
            and not isinstance(payload["args"], dict):
        payload["args"] = dict(vars(payload["args"]))
    data = flax.serialization.msgpack_serialize(_sanitize(payload))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)


def _is_torch_file(path: str) -> bool:
    with open(path, "rb") as f:
        magic = f.read(4)
    # torch >=1.6 zip serialization starts with PK; legacy pickle with \x80
    return magic[:2] == b"PK" or magic[:1] == b"\x80"


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Load a checkpoint saved by save_checkpoint, or a reference torch ckpt."""
    if _is_torch_file(path):
        from tools.port_torch_weights import load_reference_checkpoint
        return load_reference_checkpoint(path)
    with open(path, "rb") as f:
        data = f.read()
    return flax.serialization.msgpack_restore(data)


def filtered_update(params, loaded):
    """Mimic the reference's key-filtered load (train_human.py:163-167):
    copy leaves present in both trees with matching shapes, keep the rest."""

    def merge(p, l):
        if isinstance(p, dict) and isinstance(l, dict):
            return {k: merge(v, l[k]) if k in l else v for k, v in p.items()}
        try:
            if np.shape(p) == np.shape(l):
                return np.asarray(l)
        except Exception:
            pass
        return p

    return merge(params, loaded)
