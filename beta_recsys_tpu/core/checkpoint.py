"""Checkpointing of (params, opt_state, step, best_metric) pytrees.

Reference semantics: save-on-improvement of the valid metric, resume for final
test (beta_rec/models/torch_engine.py:70-90, core/train_engine.py:200-223).
Serialization uses flax msgpack (host numpy), so checkpoints are
device/backend-independent; an Orbax async path can be swapped in for
multi-host runs without changing callers.
"""

import json
import os

import jax
import numpy as np
from flax import serialization

from ..utils.common import ensure_dir


def save_checkpoint(ckpt_dir, state_dict, name="checkpoint.msgpack"):
    """Serialize a dict of pytrees (params/opt_state/...) plus metadata."""
    ensure_dir(ckpt_dir)
    host_state = jax.device_get(state_dict)
    path = os.path.join(ckpt_dir, name)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(host_state))
    return path


def load_checkpoint(ckpt_dir, target, name="checkpoint.msgpack"):
    """Restore into ``target`` (a template pytree with the right structure)."""
    path = os.path.join(ckpt_dir, name)
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def save_metadata(ckpt_dir, metadata, name="metadata.json"):
    ensure_dir(ckpt_dir)
    with open(os.path.join(ckpt_dir, name), "w") as f:
        json.dump(_to_jsonable(metadata), f, indent=2)


def load_metadata(ckpt_dir, name="metadata.json"):
    with open(os.path.join(ckpt_dir, name)) as f:
        return json.load(f)


def _to_jsonable(obj):
    if isinstance(obj, dict):
        return {k: _to_jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_jsonable(v) for v in obj]
    if isinstance(obj, (np.generic, np.ndarray)):
        return obj.tolist()
    if hasattr(obj, "item"):
        return obj.item()
    return obj
