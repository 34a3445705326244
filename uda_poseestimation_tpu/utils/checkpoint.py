"""Checkpoint save/load with the reference's contract — torch-readable.

The reference saves ``{student, teacher, stu_optimizer, lr_scheduler, epoch,
args}`` under ``best_pt.pth`` / ``best.pth`` when target-'all' PCK improves
(train_human.py:226-237); resume restores everything except the teacher-EMA
optimizer (:153-160). ``save_checkpoint`` writes the same dict via
``torch.save`` with the student/teacher entries as ``module.``-prefixed torch
state dicts (the DataParallel layout the reference writes and reads), so
reference-side tooling can ``torch.load`` + ``load_state_dict`` our
artifacts directly. Our own extras (optax optimizer state, as a nested
numpy pytree) ride in the same pickle under their reference key names.

``load_checkpoint`` accepts three formats transparently: checkpoints written
here, reference torch checkpoints (for --pretrain/--resume against upstream
artifacts), and this framework's legacy round-1/2 msgpack files.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import flax.serialization
import jax
import numpy as np

_FORMAT_TAG = "uda_poseestimation_tpu"


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _sanitize(obj):
    """Deep-convert to plain picklable types: tuples/namedtuples -> lists or
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
    """Serialize a checkpoint dict, torch-readable.

    ``student``/``teacher`` entries holding ``{'params', 'batch_stats'}``
    Flax variables are exported to ``module.``-prefixed torch state dicts
    (bit-exact transposes; tools/port_torch_weights.py round-trips them);
    everything else is sanitized to plain python/numpy and pickled by
    ``torch.save`` in the reference's dict layout.
    """
    import torch

    from tools.port_torch_weights import export_pose_resnet

    payload = dict(payload)
    for key in ("student", "teacher"):
        entry = payload.get(key)
        if isinstance(entry, dict) and "params" in entry:
            try:
                payload[key] = export_pose_resnet(_to_numpy_tree(entry))
            except KeyError:
                # not a PoseResNet tree (custom/test models): keep the raw
                # sanitized pytree — the torch state-dict contract only
                # exists for the reference's PoseResNet architecture
                payload[key] = _sanitize(entry)
    if "stu_optimizer" in payload and payload["stu_optimizer"] is not None:
        payload["stu_optimizer"] = _sanitize(flax.serialization.to_state_dict(
            payload["stu_optimizer"]))
    if "args" in payload and payload["args"] is not None \
            and not isinstance(payload["args"], dict):
        payload["args"] = dict(vars(payload["args"]))
    payload = {k: v if k in ("student", "teacher") else _sanitize(v)
               for k, v in payload.items()}
    payload["format"] = _FORMAT_TAG
    os.makedirs(os.path.dirname(path), exist_ok=True)
    torch.save(payload, path)


def _is_torch_file(path: str) -> bool:
    with open(path, "rb") as f:
        magic = f.read(4)
    # torch >=1.6 zip serialization starts with PK; legacy pickle with \x80
    return magic[:2] == b"PK" or magic[:1] == b"\x80"


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Load a checkpoint saved by save_checkpoint, a reference torch ckpt,
    or a legacy msgpack checkpoint from earlier rounds of this framework."""
    if _is_torch_file(path):
        from tools.port_torch_weights import load_reference_checkpoint
        return load_reference_checkpoint(path)
    with open(path, "rb") as f:
        data = f.read()
    return flax.serialization.msgpack_restore(data)


def restore_train_state(state, checkpoint: Dict[str, Any], mesh, *,
                        teacher_source: str = "teacher",
                        load_optimizer: bool = False, log=None):
    """Apply a loaded checkpoint onto a TrainState, reference-style.

    Mirrors the reference's key-filtered resume/pretrain loads
    (/root/reference/train_human.py:153-167, 240-257): student and teacher
    params/batch-stats merge through :func:`filtered_update`;
    ``teacher_source='student'`` reproduces the pretrain path where both
    models start from the pretrained student. The student optimizer state is
    restored only when ``load_optimizer=True`` (the reference deliberately
    skips the teacher-EMA optimizer, :153-160); an incompatible optimizer
    tree logs and keeps the fresh one, as upstream's filtered load would.

    ``filtered_update``/``from_state_dict`` leave host numpy leaves in the
    state, so the merged state is re-replicated over ``mesh`` before
    returning — required before feeding it to the sharded jitted steps.
    """
    from ..parallel.mesh import replicate

    loaded_stu = checkpoint["student"]
    loaded_tea = checkpoint[teacher_source]
    state = state.replace(
        student_params=filtered_update(state.student_params,
                                       loaded_stu["params"]),
        student_stats=filtered_update(state.student_stats,
                                      loaded_stu.get("batch_stats", {})),
        teacher_params=filtered_update(state.teacher_params,
                                       loaded_tea["params"]),
        teacher_stats=filtered_update(state.teacher_stats,
                                      loaded_tea.get("batch_stats", {})))
    if load_optimizer and checkpoint.get("stu_optimizer") is not None:
        try:
            state = state.replace(opt_state=flax.serialization.from_state_dict(
                state.opt_state, checkpoint["stu_optimizer"]))
        except Exception:
            if log is not None:
                log("resume: optimizer state incompatible; reinitialized")
    return replicate(state, mesh)


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
