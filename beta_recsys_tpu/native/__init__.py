"""ctypes bindings for the native host-side data-pipeline kernels.

Builds ``libbetarec_host.so`` on first use (g++, see Makefile); every entry
point has a numpy fallback so the framework works without a toolchain.
Use ``native.available()`` to check which path is active.
"""

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "libbetarec_host.so")
_lib = None
_build_attempted = False


def _load():
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) and not _build_attempted:
        _build_attempted = True
        try:
            subprocess.run(
                ["make", "-C", _HERE, "-s"], check=True, capture_output=True, timeout=120
            )
        except Exception:
            return None
    if os.path.exists(_SO_PATH):
        try:
            lib = ctypes.CDLL(_SO_PATH)
            lib.alias_build.restype = None
            lib.alias_sample.restype = None
            lib.feed_neg_batch.restype = ctypes.c_int
            lib.kcore_filter.restype = None
            _lib = lib
        except OSError:
            return None
    return _lib


def available():
    """True when the native library loaded (or could be built)."""
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def alias_build(freqs):
    """Build (prob_arr, alias_arr) from frequencies; native or numpy."""
    freqs = np.ascontiguousarray(freqs, dtype=np.float64)
    n = len(freqs)
    lib = _load()
    prob = np.empty(n, dtype=np.float64)
    alias = np.empty(n, dtype=np.int64)
    if lib is not None:
        lib.alias_build(
            _ptr(freqs, ctypes.c_double), ctypes.c_int64(n),
            _ptr(prob, ctypes.c_double), _ptr(alias, ctypes.c_int64),
        )
        return prob, alias
    from ..utils.alias_table import AliasTable

    t = AliasTable(list(freqs))
    return t.prob_arr, t.alias_arr


def alias_sample(prob, alias, count, seed=0):
    """Draw ``count`` table indices with replacement."""
    prob = np.ascontiguousarray(prob, dtype=np.float64)
    alias = np.ascontiguousarray(alias, dtype=np.int64)
    out = np.empty(count, dtype=np.int64)
    lib = _load()
    if lib is not None:
        lib.alias_sample(
            _ptr(prob, ctypes.c_double), _ptr(alias, ctypes.c_int64),
            ctypes.c_int64(len(prob)), ctypes.c_int64(count),
            ctypes.c_uint64(seed), _ptr(out, ctypes.c_int64),
        )
        return out
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, len(prob), size=count)
    u = rng.random(count)
    return np.where(u < prob[idx], idx, alias[idx])


def feed_neg_batch(indptr, pos_items, prob, alias, labels, n_negative, seed=0):
    """Unique per-user negatives excluding positives: (n_users, n_negative)."""
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    pos_items = np.ascontiguousarray(pos_items, dtype=np.int64)
    prob = np.ascontiguousarray(prob, dtype=np.float64)
    alias = np.ascontiguousarray(alias, dtype=np.int64)
    labels = np.ascontiguousarray(labels, dtype=np.int64)
    n_users = len(indptr) - 1
    out = np.empty((n_users, n_negative), dtype=np.int64)
    lib = _load()
    if lib is not None:
        rc = lib.feed_neg_batch(
            _ptr(indptr, ctypes.c_int64), _ptr(pos_items, ctypes.c_int64),
            ctypes.c_int64(n_users), _ptr(prob, ctypes.c_double),
            _ptr(alias, ctypes.c_int64), _ptr(labels, ctypes.c_int64),
            ctypes.c_int64(len(prob)), ctypes.c_int64(n_negative),
            ctypes.c_uint64(seed), _ptr(out, ctypes.c_int64),
        )
        if rc != 0:
            raise RuntimeError("Insufficient distinct negative items for sampling")
        return out
    # numpy fallback: draw with rejection per user (bounded, like the C++ path)
    rng = np.random.default_rng(seed)
    for u in range(n_users):
        pos = set(pos_items[indptr[u] : indptr[u + 1]].tolist())
        got = []
        seen = set()
        attempts = 0
        max_attempts = 100 * (n_negative + 1) + 16 * len(prob)
        while len(got) < n_negative:
            attempts += 1
            if attempts > max_attempts:
                raise RuntimeError("Insufficient distinct negative items for sampling")
            idx = rng.integers(0, len(prob), size=n_negative * 2)
            uu = rng.random(len(idx))
            draws = labels[np.where(uu < prob[idx], idx, alias[idx])]
            for d in draws:
                if d not in pos and d not in seen:
                    seen.add(d)
                    got.append(d)
                    if len(got) == n_negative:
                        break
        out[u] = got
    return out


def kcore_filter(users, items, n_users, n_items, min_u_c, min_i_c):
    """Surviving-row mask for the iterative k-core filter."""
    users = np.ascontiguousarray(users, dtype=np.int64)
    items = np.ascontiguousarray(items, dtype=np.int64)
    keep = np.empty(len(users), dtype=np.uint8)
    lib = _load()
    if lib is not None:
        lib.kcore_filter(
            _ptr(users, ctypes.c_int64), _ptr(items, ctypes.c_int64),
            ctypes.c_int64(len(users)), ctypes.c_int64(n_users),
            ctypes.c_int64(n_items), ctypes.c_int64(min_u_c),
            ctypes.c_int64(min_i_c), _ptr(keep, ctypes.c_uint8),
        )
        return keep.astype(bool)
    keep[:] = 1
    keep = keep.astype(bool)
    changed = True
    while changed:
        changed = False
        u_deg = np.bincount(users[keep], minlength=n_users)
        i_deg = np.bincount(items[keep], minlength=n_items)
        drop = keep & (
            ((min_i_c > 0) & (u_deg[users] < min_i_c))
            | ((min_u_c > 0) & (i_deg[items] < min_u_c))
        )
        if drop.any():
            keep &= ~drop
            changed = True
    return keep
