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


def _rebuild():
    subprocess.run(
        ["make", "-C", _HERE, "-s", "-B"], check=True, capture_output=True, timeout=120
    )


def _bind(lib):
    lib.alias_build.restype = None
    lib.alias_sample.restype = None
    lib.feed_neg_batch.restype = ctypes.c_int
    lib.kcore_filter.restype = None
    lib.kcore_filter_distinct.restype = None
    return lib


def _load():
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) and not _build_attempted:
        _build_attempted = True
        try:
            _rebuild()
        except Exception:
            return None
    if os.path.exists(_SO_PATH):
        try:
            _lib = _bind(ctypes.CDLL(_SO_PATH))
        except (OSError, AttributeError):
            # AttributeError = a stale .so built before a newer entry point
            # was added (the .so is untracked); rebuild once and retry —
            # never let a stale binary break the numpy fallback path.
            if _build_attempted:
                return None
            _build_attempted = True
            try:
                _rebuild()
                _lib = _bind(ctypes.CDLL(_SO_PATH))
            except Exception:
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


def kcore_filter_distinct(users, items, pair_ids, uo_ids, n_users, n_items,
                          n_pairs, n_uos, min_u_c, min_i_c, min_o_c=0):
    """Surviving-row mask for the DISTINCT-count k-core (pandas nunique
    semantics): users need >= min_i_c distinct items (and, with ``uo_ids``,
    >= min_o_c distinct orders); items need >= min_u_c distinct users.

    ``pair_ids``/``uo_ids`` are dense factorizations of (user, item) and
    (user, order); pass ``uo_ids=None`` when min_o_c == 0. Numpy fallback
    mirrors the C++ kernel exactly.
    """
    users = np.ascontiguousarray(users, dtype=np.int64)
    items = np.ascontiguousarray(items, dtype=np.int64)
    pair_ids = np.ascontiguousarray(pair_ids, dtype=np.int64)
    has_orders = uo_ids is not None and min_o_c > 0
    if has_orders:
        uo_ids = np.ascontiguousarray(uo_ids, dtype=np.int64)
    n_rows = len(users)
    keep = np.empty(n_rows, dtype=np.uint8)
    lib = _load()
    if lib is not None:
        lib.kcore_filter_distinct(
            _ptr(users, ctypes.c_int64), _ptr(items, ctypes.c_int64),
            _ptr(pair_ids, ctypes.c_int64),
            _ptr(uo_ids, ctypes.c_int64) if has_orders else None,
            ctypes.c_int64(n_rows), ctypes.c_int64(n_users),
            ctypes.c_int64(n_items), ctypes.c_int64(n_pairs),
            ctypes.c_int64(n_uos if has_orders else 0),
            ctypes.c_int64(min_u_c), ctypes.c_int64(min_i_c),
            ctypes.c_int64(min_o_c if has_orders else 0),
            _ptr(keep, ctypes.c_uint8),
        )
        return keep.astype(bool)
    keep[:] = 1
    keep = keep.astype(bool)
    changed = True
    while changed:
        changed = False
        alive = np.flatnonzero(keep)
        # np.unique over surviving group ids gives one representative per group
        upairs = np.unique(pair_ids[alive])
        user_items = np.zeros(n_users, dtype=np.int64)
        item_users = np.zeros(n_items, dtype=np.int64)
        # map each surviving pair group back to its (user, item) via any row
        rep = np.zeros(n_pairs, dtype=np.int64)
        rep[pair_ids[alive]] = alive  # last write wins; any row of the group works
        np.add.at(user_items, users[rep[upairs]], 1)
        np.add.at(item_users, items[rep[upairs]], 1)
        drop = keep & (
            ((min_i_c > 0) & (user_items[users] < min_i_c))
            | ((min_u_c > 0) & (item_users[items] < min_u_c))
        )
        if has_orders:
            uuos = np.unique(uo_ids[alive])
            rep_uo = np.zeros(n_uos, dtype=np.int64)
            rep_uo[uo_ids[alive]] = alive
            user_orders = np.zeros(n_users, dtype=np.int64)
            np.add.at(user_orders, users[rep_uo[uuos]], 1)
            drop |= keep & (user_orders[users] < min_o_c)
        if drop.any():
            keep &= ~drop
            changed = True
    return keep
