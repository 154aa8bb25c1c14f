"""Checkpointing of (params, opt_state, rng, epoch, best_metric) pytrees.

Reference semantics: save-on-improvement of the valid metric, resume for final
test (beta_rec/models/torch_engine.py:70-90, core/train_engine.py:200-223).
The reference persists only the model ``state_dict``; here the FULL training
state round-trips (optimizer moments, RNG key, epoch counter, early-stop
bookkeeping), so an interrupted run resumes exactly.

Two interchangeable backends:

- ``"flax"`` (default): single-file msgpack via flax.serialization — host
  numpy, device/backend-independent, no extra processes.
- ``"orbax"``: directory-per-checkpoint via orbax.checkpoint
  StandardCheckpointer — async-capable and multi-host/sharded-array aware
  (SURVEY §5 names Orbax as the TPU-native equivalent of torch.save).
"""

import json
import os

import jax
import numpy as np
from flax import serialization

from ..utils.common import ensure_dir

_ORBAX_SUBDIR = "orbax_state"


def _orbax_checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint(ckpt_dir, state_dict, name="checkpoint.msgpack", backend="flax"):
    """Serialize a dict of pytrees (params/opt_state/...) plus metadata."""
    ensure_dir(ckpt_dir)
    if backend == "orbax":
        path = os.path.abspath(os.path.join(ckpt_dir, _ORBAX_SUBDIR))
        ckptr = _orbax_checkpointer()
        ckptr.save(path, state_dict, force=True)
        ckptr.wait_until_finished()
        return path
    host_state = jax.device_get(state_dict)
    path = os.path.join(ckpt_dir, name)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(host_state))
    return path


def load_checkpoint(ckpt_dir, target, name="checkpoint.msgpack", backend=None):
    """Restore into ``target`` (a template pytree with the right structure).

    ``backend=None`` auto-detects. When both formats exist in the directory
    (e.g. ``checkpoint_backend`` switched between runs using the same dir),
    the NEWER artifact by mtime wins and a warning is printed — a stale file
    must never silently shadow newer state.
    """
    if backend is None:
        backend = _detect_backend(ckpt_dir, name)
    if backend == "orbax":
        orbax_path = os.path.abspath(os.path.join(ckpt_dir, _ORBAX_SUBDIR))
        return _orbax_checkpointer().restore(orbax_path, target)
    with open(os.path.join(ckpt_dir, name), "rb") as f:
        return serialization.from_bytes(target, f.read())


def _detect_backend(ckpt_dir, name):
    orbax_path = os.path.abspath(os.path.join(ckpt_dir, _ORBAX_SUBDIR))
    flax_path = os.path.join(ckpt_dir, name)
    has_orbax = os.path.isdir(orbax_path)
    has_flax = os.path.exists(flax_path)
    if has_orbax and has_flax:
        backend = (
            "orbax"
            if os.path.getmtime(orbax_path) > os.path.getmtime(flax_path)
            else "flax"
        )
        print(
            f"[warn] both flax and orbax checkpoints exist in {ckpt_dir}; "
            f"restoring the newer one ({backend})"
        )
        return backend
    return "orbax" if has_orbax else "flax"


def load_raw_checkpoint(ckpt_dir, name="checkpoint.msgpack", backend=None):
    """Restore WITHOUT a target template: returns the raw nested-dict state.

    Enables cold-start serving — a fresh process can read a checkpoint's
    params knowing only the directory, then map them onto a freshly-built
    model with ``flax.serialization.from_state_dict``.
    """
    if backend is None:
        backend = _detect_backend(ckpt_dir, name)
    if backend == "orbax":
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(ckpt_dir, _ORBAX_SUBDIR))
        with ocp.PyTreeCheckpointer() as ckptr:
            return ckptr.restore(path)
    with open(os.path.join(ckpt_dir, name), "rb") as f:
        return serialization.msgpack_restore(f.read())


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
