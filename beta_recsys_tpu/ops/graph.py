"""On-device sparse graph propagation and edge dropout, scatter-free on TPU.

TPU has no native SpMM, and XLA lowers both ``segment_sum`` and ``scatter_add``
to slow serialized scatters (measured ~30-45 GB/s effective on v5e — a 10-25x
gap to HBM speed-of-light). The reference's ``torch.sparse.mm`` propagation
(beta_rec/models/lightgcn.py:73) therefore becomes one of three scatter-free
strategies, chosen per graph by :func:`pack_propagator`:

- **dense** (small graphs): the normalized adjacency is densified once at pack
  time and propagation is a plain MXU matmul — the systolic array IS the
  segment reduction. ~8x over segment-sum at ml-100k scale.
- **chunked** (large graphs): a windowed *segment-matmul*. Edges are sorted by
  destination row and grouped into 256-row windows; each window's edges are
  padded into capacity buckets, and the per-window reduction
  ``out[r] += v * x[c]`` is expressed as ``onehot(r) @ (v * x[c])`` — an MXU
  matmul instead of a scatter. The backward pass reuses the same kernel with a
  transposed edge pack (custom VJP), so no scatter appears in the gradient
  either. Per-step edge values (dropout / SGL augmentation) are supported via
  a static permutation gather from COO order into the packed layout.
- **coo** (fallback, any backend): gather + ``segment_sum`` as before.

All strategies implement ``out = A @ x`` for the same COO ``(rows, cols,
vals)`` artifact produced by ``BaseData.get_norm_adj`` and agree to float
tolerance; see tests/test_graph_propagator.py.
"""

import numpy as np

import jax
import jax.numpy as jnp


def spmm_coo(rows, cols, vals, dense):
    """Sparse (n x n, COO) @ dense (n x d) -> (n x d)."""
    gathered = dense[cols] * vals[:, None]
    return jax.ops.segment_sum(gathered, rows, num_segments=dense.shape[0])


def edge_dropout(rng, vals, keep_prob):
    """Drop edges with prob (1 - keep_prob), rescaling kept weights by 1/keep_prob.

    Matches the reference's sparse dropout semantics
    (beta_rec/models/lightgcn.py:27-38): mask = int(rand + keep_prob).
    """
    keep = jax.random.uniform(rng, vals.shape) < keep_prob
    return jnp.where(keep, vals / keep_prob, 0.0)


def sgl_augment(rng, rows, cols, n_nodes, aug_type=1, ssl_ratio=0.1):
    """On-device SGL graph augmentation: returns re-normalized edge values.

    aug_type 0 (node dropout): drop a node subset; edges touching dropped nodes
    vanish. aug_type 1/2 (edge dropout / random walk): drop edges independently.
    The surviving subgraph is sym-renormalized D^-1/2 A D^-1/2 on device
    (the reference rebuilds scipy matrices per epoch host-side,
    beta_rec/data/base_data.py:433-496; here a fresh view is drawn per loss
    call with no host round-trip).
    """
    if aug_type == 0:
        k1, k2 = jax.random.split(rng)
        node_keep = jax.random.uniform(k1, (n_nodes,)) >= ssl_ratio
        keep = node_keep[rows] & node_keep[cols]
    else:
        # Undirected dropout: both directions of an interaction edge share the
        # same draw (keyed on the canonical pair), keeping A symmetric like the
        # reference's host-side edge subsampling.
        lo = jnp.minimum(rows, cols).astype(jnp.uint32)
        hi = jnp.maximum(rows, cols).astype(jnp.uint32)
        pair_id = lo * jnp.uint32(n_nodes) + hi
        keys = jax.vmap(lambda i: jax.random.fold_in(rng, i))(pair_id)
        u = jax.vmap(lambda k: jax.random.uniform(k))(keys)
        keep = u >= ssl_ratio
    ones = jnp.where(keep, 1.0, 0.0)
    deg = jax.ops.segment_sum(ones, rows, num_segments=n_nodes)
    d_inv_sqrt = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
    return ones * d_inv_sqrt[rows] * d_inv_sqrt[cols]


# --------------------------------------------------------------------------
# Scatter-free propagation strategies
# --------------------------------------------------------------------------

_DENSE_MAX_NODES = 4096  # dense A payload cap: 4096^2 f32 = 64 MB
_WINDOW_R = 256          # output rows per window (MXU-aligned)
_CAP_UNIT = 256          # edge-capacity quantum per window (MXU K dim)
_ONEHOT_BYTES_BUDGET = 8 * 1024 * 1024  # transient one-hot per scan step


class DensePropagator:
    """out = A @ x with A densified once (MXU path for small graphs)."""

    format = "dense"

    def __init__(self, rows, cols, vals, n_nodes):
        self.n_nodes = int(n_nodes)
        self.rows = jnp.asarray(rows, jnp.int32)
        self.cols = jnp.asarray(cols, jnp.int32)
        a = np.zeros((self.n_nodes, self.n_nodes), np.float32)
        np.add.at(a, (np.asarray(rows), np.asarray(cols)), np.asarray(vals, np.float32))
        self.dense = jnp.asarray(a)

    def spmm(self, x, vals=None):
        if vals is None:
            return jnp.dot(self.dense, x, preferred_element_type=jnp.float32).astype(x.dtype)
        a = jnp.zeros((self.n_nodes, self.n_nodes), x.dtype).at[self.rows, self.cols].add(vals)
        return jnp.dot(a, x, preferred_element_type=jnp.float32).astype(x.dtype)


class CooPropagator:
    """Gather + segment-sum fallback (portable; backward hits XLA scatter)."""

    format = "coo"

    def __init__(self, rows, cols, vals, n_nodes):
        self.n_nodes = int(n_nodes)
        self.rows = jnp.asarray(rows, jnp.int32)
        self.cols = jnp.asarray(cols, jnp.int32)
        self.vals = jnp.asarray(vals, jnp.float32)

    def spmm(self, x, vals=None):
        v = self.vals if vals is None else vals
        gathered = x[self.cols] * v[:, None].astype(x.dtype)
        return jax.ops.segment_sum(gathered, self.rows, num_segments=self.n_nodes)


class _WindowPack:
    """One direction (A or A^T) of the chunked segment-matmul layout.

    Buckets of windows with equal padded edge capacity. Per bucket b:
      perm_b  (n_wb, cap_b) int32 — index into the ORIGINAL COO edge order
                                     (clipped to 0 on padding slots)
      mask_b  (n_wb, cap_b) f32   — 1 on real edges, 0 on padding
      offs_b  (n_wb, cap_b) int32 — row offset within the window [0, R)
    win_inv (n_windows,) maps concat-of-buckets order back to window order.
    """

    def __init__(self, rows, cols, vals, n_nodes, R=_WINDOW_R, cap_unit=_CAP_UNIT):
        rows = np.asarray(rows, np.int64)
        cols = np.asarray(cols, np.int64)
        vals = np.asarray(vals, np.float32)
        self.n_nodes = int(n_nodes)
        self.R = R
        n_windows = max(1, -(-self.n_nodes // R))
        self.n_windows = n_windows

        order = np.argsort(rows, kind="stable")
        r_sorted = rows[order]
        win_of_edge = r_sorted // R
        counts = np.bincount(win_of_edge, minlength=n_windows)

        # Capacity per window: cap_unit * 2^k (>= count), min cap_unit.
        caps = np.full(n_windows, cap_unit, np.int64)
        nz = counts > cap_unit
        caps[nz] = cap_unit * (2 ** np.ceil(np.log2(counts[nz] / cap_unit)).astype(np.int64))

        edge_starts = np.concatenate([[0], np.cumsum(counts)])
        self.buckets = []
        win_order = []
        for cap in np.unique(caps):
            wins = np.nonzero(caps == cap)[0]
            n_wb = len(wins)
            perm = np.zeros((n_wb, cap), np.int64)
            mask = np.zeros((n_wb, cap), np.float32)
            offs = np.zeros((n_wb, cap), np.int64)
            for j, w in enumerate(wins):
                s, e = edge_starts[w], edge_starts[w + 1]
                k = e - s
                # positions into original COO order for this window's edges
                perm[j, :k] = order[s:e]
                mask[j, :k] = 1.0
                offs[j, :k] = r_sorted[s:e] - w * R
            self.buckets.append(
                (
                    jnp.asarray(perm, jnp.int32),
                    jnp.asarray(mask, jnp.float32),
                    jnp.asarray(offs, jnp.int32),
                    jnp.asarray(cols[perm], jnp.int32),
                    jnp.asarray(vals[perm] * mask, jnp.float32),
                )
            )
            win_order.append(wins)
        win_order = np.concatenate(win_order)
        self.win_inv = jnp.asarray(np.argsort(win_order), jnp.int32)

    def apply(self, x, vals_coo=None):
        """out = A @ x. vals_coo (original COO edge order) overrides pack-time vals."""
        d = x.shape[1]
        blocks = []
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (1, 1, self.R), 2)
        for perm, mask, offs, cols_p, vals_p in self.buckets:
            v = vals_p if vals_coo is None else vals_coo[perm] * mask
            n_wb, cap = cols_p.shape
            gathered = x[cols_p] * v[..., None].astype(x.dtype)  # (n_wb, cap, d)
            # scan groups so the transient one-hot stays within budget
            g = max(1, min(n_wb, _ONEHOT_BYTES_BUDGET // (cap * self.R * 4)))
            n_groups = -(-n_wb // g)
            pad = n_groups * g - n_wb
            offs_g = jnp.pad(offs, ((0, pad), (0, 0))).reshape(n_groups, g, cap)
            gath_g = jnp.pad(gathered, ((0, pad), (0, 0), (0, 0))).reshape(
                n_groups, g, cap, d
            )

            def seg(_, oh_in):
                offs_grp, gath_grp = oh_in
                onehot = (offs_grp[:, :, None] == iota_r).astype(x.dtype)  # (g, cap, R)
                out = jnp.einsum(
                    "wcr,wcd->wrd", onehot, gath_grp,
                    preferred_element_type=jnp.float32,
                ).astype(x.dtype)
                return None, out

            _, out_b = jax.lax.scan(seg, None, (offs_g, gath_g))
            blocks.append(out_b.reshape(n_groups * g, self.R, d)[:n_wb])
        all_blocks = jnp.concatenate(blocks, axis=0)[self.win_inv]
        return all_blocks.reshape(self.n_windows * self.R, d)[: self.n_nodes]


class ChunkedPropagator:
    """Windowed segment-matmul SpMM: scatter-free forward AND backward.

    The custom VJP computes dx = A^T @ g with a transposed edge pack (same
    MXU kernel) and dvals via two gathers — no XLA scatter anywhere.
    """

    format = "chunked"

    def __init__(self, rows, cols, vals, n_nodes):
        self.n_nodes = int(n_nodes)
        self.vals = jnp.asarray(vals, jnp.float32)
        self._fwd = _WindowPack(rows, cols, vals, n_nodes)
        self._bwd = _WindowPack(cols, rows, vals, n_nodes)
        rows_j = jnp.asarray(rows, jnp.int32)
        cols_j = jnp.asarray(cols, jnp.int32)
        fwd_pack, bwd_pack = self._fwd, self._bwd

        @jax.custom_vjp
        def spmm(x, vals_coo):
            return fwd_pack.apply(x, vals_coo)

        def spmm_fwd(x, vals_coo):
            return fwd_pack.apply(x, vals_coo), (x, vals_coo)

        def spmm_bwd(res, g):
            x, vals_coo = res
            dx = bwd_pack.apply(g, vals_coo)
            dvals = jnp.sum(x[cols_j] * g[rows_j], axis=-1)
            return dx, dvals

        spmm.defvjp(spmm_fwd, spmm_bwd)
        self._spmm = spmm

    def spmm(self, x, vals=None):
        return self._spmm(x, self.vals if vals is None else vals)


def pack_propagator(rows, cols, vals, n_nodes, fmt="auto", dense_max_nodes=_DENSE_MAX_NODES):
    """Build the fastest scatter-free propagator for this graph.

    fmt: 'auto' | 'dense' | 'chunked' | 'coo'. 'auto' picks dense when the
    densified adjacency fits the payload cap (n_nodes <= dense_max_nodes),
    else the windowed segment-matmul.
    """
    if fmt == "auto":
        fmt = "dense" if n_nodes <= dense_max_nodes else "chunked"
    if fmt == "dense":
        return DensePropagator(rows, cols, vals, n_nodes)
    if fmt == "chunked":
        return ChunkedPropagator(rows, cols, vals, n_nodes)
    if fmt == "coo":
        return CooPropagator(rows, cols, vals, n_nodes)
    raise ValueError(f"Unknown propagator format {fmt!r}")


def propagate_mean(prop, user_emb, item_emb, n_layers, vals=None):
    """Layer-averaged LightGCN propagation through a packed Propagator."""
    n_users = user_emb.shape[0]
    all_emb = jnp.concatenate([user_emb, item_emb], axis=0)
    acc = all_emb
    emb = all_emb
    for _ in range(n_layers):
        emb = prop.spmm(emb, vals)
        acc = acc + emb
    final = acc / (n_layers + 1)
    return final[:n_users], final[n_users:]


def lightgcn_propagate(rows, cols, vals, user_emb, item_emb, n_layers):
    """Layer-averaged LightGCN propagation over the joint (users+items) graph.

    Returns (user_final, item_final): mean over layer outputs 0..n_layers
    (reference: beta_rec/models/lightgcn.py:55-78).
    """
    n_users = user_emb.shape[0]
    all_emb = jnp.concatenate([user_emb, item_emb], axis=0)
    acc = all_emb
    emb = all_emb
    for _ in range(n_layers):
        emb = spmm_coo(rows, cols, vals, emb)
        acc = acc + emb
    final = acc / (n_layers + 1)
    return final[:n_users], final[n_users:]
