"""Sparse (lazy) Adam for embedding-dominated models.

Production-scale embedding tables make dense optimizers the bottleneck: a
standard optax.adam step reads/writes EVERY row of every table (m, v, params —
~6 full-table HBM passes per step), so epoch cost scales with
O(steps * n_rows * dim) regardless of batch size. For a 1M x 64 MF table at
10M interactions/epoch that is ~2 TB of optimizer traffic per epoch.

This module trains such models with per-row updates: gradients are taken with
respect to the *gathered rows* (a (B, d) tensor), and Adam moments/params are
updated only at the touched ids via scatter. Cost per step becomes
O(batch * dim) — independent of table height.

Semantics are TF-style "lazy Adam": the bias-correction step count is global,
and duplicate ids inside one batch have their gradient rows summed (segment
semantics) before a single moment update per unique-row occurrence, which is
the standard approximation (exact Adam would serialize duplicates).

Models opt in by implementing ``row_loss(row_values, aux_params, batch, rng)``
and ``row_tables()`` (see models/mf.py MF.row_tables); the generic trainer
handles everything else. Enable with model config ``"sparse_optim": true``.
"""

import functools

import jax
import jax.numpy as jnp
import optax


def _segment_dedup(ids, rows):
    """Sum gradient rows of duplicate ids: returns (ids, summed_rows).

    Keeps the original (static) length; duplicate occurrences beyond the first
    carry zero rows, so their scatter contributions are no-ops.
    """
    order = jnp.argsort(ids)
    sorted_ids = ids[order]
    sorted_rows = rows[order]
    first = jnp.concatenate([jnp.array([True]), sorted_ids[1:] != sorted_ids[:-1]])
    seg = jnp.cumsum(first) - 1
    summed = jax.ops.segment_sum(sorted_rows, seg, num_segments=ids.shape[0])
    # place sums at the first occurrence; others become zero rows
    dedup_rows = jnp.where(first[:, None], summed[seg], 0.0)
    return sorted_ids, dedup_rows


def sparse_adam_row_update(table, m, v, ids, grad_rows, lr, step, b1=0.9, b2=0.999, eps=1e-8):
    """Apply one lazy-Adam update to the rows ``ids`` of (table, m, v).

    1-D tables (bias vectors) are handled as single-column matrices.
    """
    one_d = table.ndim == 1
    if one_d:
        table, m, v = table[:, None], m[:, None], v[:, None]
        grad_rows = grad_rows[:, None]
    ids, grad_rows = _segment_dedup(ids, grad_rows)
    m_rows = b1 * m[ids] + (1 - b1) * grad_rows
    v_rows = b2 * v[ids] + (1 - b2) * grad_rows**2
    m_hat = m_rows / (1 - b1**step)
    v_hat = v_rows / (1 - b2**step)
    delta = -lr * m_hat / (jnp.sqrt(v_hat) + eps)
    # Zero grad rows (duplicate occurrences) produce pure-momentum deltas;
    # mask them out so each unique row updates exactly once.
    touched = jnp.any(grad_rows != 0, axis=1, keepdims=True)
    delta = jnp.where(touched, delta, 0.0)
    # All writes are scatter-ADDs of deltas: duplicate ids contribute zero
    # deltas beyond the first occurrence, so write order cannot matter
    # (scatter .set with duplicate indices is nondeterministic).
    m_delta = jnp.where(touched, m_rows - m[ids], 0.0)
    v_delta = jnp.where(touched, v_rows - v[ids], 0.0)
    table = table.at[ids].add(delta)
    m = m.at[ids].add(m_delta)
    v = v.at[ids].add(v_delta)
    if one_d:
        return table[:, 0], m[:, 0], v[:, 0]
    return table, m, v


def init_sparse_state(params, table_names):
    """Adam moments for the sparse tables + an optax state for the rest."""
    moments = {
        name: (jnp.zeros_like(params[name]), jnp.zeros_like(params[name]))
        for name in table_names
    }
    # "dropped" counts unique owned ids whose gradient the bucketed exchange
    # dropped on capacity overflow (cumulative over the run; always 0 for the
    # exact allgather/psum strategies). Surfaced per-epoch by TrainEngine.
    return {"moments": moments, "step": jnp.zeros((), jnp.int32),
            "dropped": jnp.zeros((), jnp.int32)}


def _role_layout(model, params_shape):
    """Group the model's row tables by batch role for the packed layout.

    Returns {role: [(table_name, width, ndim), ...]} with a deterministic
    order (row_tables declaration order). 1-D bias tables get width 1.
    """
    roles = {}
    for name, role in model.row_tables().items():
        sh = params_shape[name].shape
        roles.setdefault(role, []).append((name, sh[1] if len(sh) == 2 else 1, len(sh)))
    return roles


def make_sparse_epoch_fn(model, train_arrays, batch_size, neg_sampler, lr, dense_optimizer=None, donate=True, compute_dtype=None, row_update="auto", compact_capacity=None):
    """Whole-epoch trainer with lazy-Adam row updates for embedding tables.

    The model must provide:
      row_tables() -> {"table_name": "batch_role"} mapping each sparse table to
        the batch ids that index it ("users" / "items_cat" = pos+neg concat)
      row_loss(rows, dense_params, batch, rng) -> scalar, where ``rows`` maps
        table_name -> the gathered (B, d) rows.
    Non-table params ("dense") update with ``dense_optimizer`` (default: adam).

    ``row_update`` selects how table rows are written back:
      "unified" — every role's tables live in ONE (total_rows, 3, W) array
        holding [param|m|v] rows, with role tables' columns side by side
        (biases fold in as width-1 columns) and roles stacked vertically at
        row offsets; batch ids from all roles concatenate (with offsets) so
        each step runs ONE full-row gather, ONE shared sort/dedup, ONE
        scatter-add — replacing the per-table path's ~20 row ops. v5e
        profiling (tools/prof_scatter_width.py, prof_step_decomp.py) shows
        why this wins: scatter/gather cost is per-OP and nearly
        width-independent ((B,768) scatter = 1.55x a (B,64) one), full-row
        gathers are ~8x cheaper than column-sliced gathers, and sorts
        amortize when shared. Measured ~2x end-to-end at (1M x 64, B=8192).
        Lazy "touched" masks stay exactly per-table (role-aware column
        masks), so the trajectory matches "xla" bit-for-bit up to float
        reassociation.
      "compact" — the unified layout + FIRST-OCCURRENCE COMPACTION of the
        scatter (r5, VERDICT r4 #2): the r4 roofline work pinned XLA's
        scatter at ~83 ns per INDEX regardless of row content, and the
        unified scatter passes all L = 3B indices even though duplicate ids
        carry zeroed rows after the segment dedup. On zipf-distributed data
        (every real dataset) the duplication factor is 1.7–3.6x
        (tools/prof_compact.py), so compacting the deduped first-occurrence
        rows to the front (one stable argsort of the existing `first` mask)
        and scattering only a fixed capacity C of them cuts the dominant
        row-op count by that factor. C defaults to a host-side estimate of
        the batch's unique-id count x1.25 (from the actual train id
        distribution) rounded to 8; unique ids beyond C in a step lose that
        step's gradient and are COUNTED in opt_state["dropped"] (same
        surfaced-overflow contract as the bucketed exchange; capacity
        C >= L makes it bit-identical to "unified"). Uniform-id data has
        duplication ~1.06 — there "compact" is a no-op by construction,
        which is why the r4 batch sweep (uniform ids) measured flat.
      "fused" — the Pallas fused_rowadam kernel (ops/pallas/rowadam.py):
        pipelined row DMAs, in-place. A/B on the real v5e: latency-bound at
        N_SLOTS outstanding row DMAs and 1.5x SLOWER end-to-end than "xla" —
        kept for future kernel work, do not default to it. Table minor dims
        are padded to 128 INSIDE the epoch (Mosaic row-DMA alignment) and
        trimmed back before returning; 1-D tables use the XLA path.
      "unified_bf16" — the unified layout at HALF the row bytes AND half
        the optimizer-state HBM (VERDICT r3 #4): each 2-D table row is
        ONE uint16 row [p_hi|p_lo|m_bf16|v_bf16] — the fp32 param split into
        its two 16-bit halves (bit-exact master weights) and the Adam
        moments rounded to bf16 (same exponent range as fp32, 8-bit
        mantissa). At emb_dim 64 a row is 4*64=256 u16 = 512 B, tile-exact,
        vs the fp32 layout's 195 f32 -> 256 lanes = 1024 B. All compute is
        fp32 (unpack -> adam -> repack); untouched column slices round-trip
        bit-exactly. The writeback is a scatter-SET whose duplicate-id
        occurrences route out of bounds (mode="drop"), preserving the
        first-occurrence dedup semantics without a second row pass. 1-D
        bias tables ride the per-table xla path (width-1 rows cannot pay
        for packing). Moment bf16 rounding is the only approximation;
        trajectory parity is pinned in tests/test_sparse_optim.py.
        MEASURED (r4, BENCH_DETAILS mf_1m_users_sparse_sweep): ~0.6x the
        fp32 unified throughput on v5e — the path is bound by per-row
        scatter/gather op rate, not bytes, so the packing ALU + separate
        bias ops cost more than the bytes save. Use it when optimizer-state
        MEMORY is the constraint (tables 2x larger per chip), not for speed.
      "xla" — per-table gather + 3 scatter-adds (sparse_adam_row_update).
      "auto" — "unified" on TPU backends, "xla" elsewhere (CPU scatters are
        bandwidth-bound, where the per-table path's narrower rows win).
    """
    users = jnp.asarray(train_arrays.users)
    items = jnp.asarray(train_arrays.items)
    n = users.shape[0]
    batch_size = min(batch_size, n)
    num_batches = -(-n // batch_size)
    padded_size = num_batches * batch_size
    table_roles = model.row_tables()
    table_names = list(table_roles)
    dense_optimizer = dense_optimizer or optax.adam(lr)
    if row_update == "auto":
        row_update = "unified" if jax.default_backend() == "tpu" else "xla"
    compact = row_update == "compact"
    if compact:
        row_update = "unified"
        if compact_capacity is None:
            # host-side estimate of unique ids per step from the actual train
            # id distribution (uniform stand-in for rejection negatives is
            # fine at x1.25 safety)
            import numpy as _np

            _rng = _np.random.default_rng(0)
            _u = _np.asarray(train_arrays.users)
            _it = _np.asarray(train_arrays.items)
            _n = len(_u)
            _n_items = int(_it.max()) + 1 if len(_it) else 1
            fracs = []
            for _ in range(4):
                _sel = _rng.integers(0, _n, batch_size)
                _ids = _np.concatenate([
                    _u[_sel].astype(_np.int64),
                    _it[_sel].astype(_np.int64) + (1 << 32),
                    _rng.integers(0, _n_items, batch_size) + (1 << 32),
                ])
                fracs.append(len(_np.unique(_ids)) / len(_ids))
            est = max(fracs) * 1.25
            compact_capacity = min(
                -(-int(3 * batch_size * est) // 8) * 8, 3 * batch_size
            )

    params_shape = jax.eval_shape(model.init_params, jax.random.key(0))
    roles = _role_layout(model, params_shape)
    role_order = list(roles)
    role_width = {
        role: sum(w for _, w, _ in specs) for role, specs in roles.items()
    }
    role_rows = {}
    for role, specs in roles.items():
        heights = {params_shape[n].shape[0] for n, _, _ in specs}
        if len(heights) != 1:
            raise ValueError(
                f"tables of role {role!r} must share a row count, got {heights}"
            )
        role_rows[role] = heights.pop()
    w_max = max(role_width.values())
    role_base = {}
    _acc = 0
    for role in role_order:
        role_base[role] = _acc
        _acc += role_rows[role]
    total_rows = _acc

    def _pack_unified(params, moments):
        """One (total_rows, 3*w_max) [param|m|v] array for every role table.

        2-D, NOT (rows, 3, w): TPU tiles the last two dims, so a (N, 3, 65)
        array is physically (N, 4, 128) — 2.6x the bytes on every gather,
        scatter, and copy. (N, 195) tiles to 256 lanes (1.3x) instead.
        """
        u = jnp.zeros((total_rows, 3 * w_max), jnp.float32)
        for role in role_order:
            b0, off = role_base[role], 0
            for n, w, nd in roles[role]:
                srcs = (params[n], moments[n][0], moments[n][1])
                for comp, s in enumerate(srcs):
                    s2 = s[:, None] if nd == 1 else s
                    u = u.at[
                        b0 : b0 + role_rows[role],
                        comp * w_max + off : comp * w_max + off + w,
                    ].set(s2)
                off += w
        return u

    def _unpack_unified(u):
        params_out, moments_out = {}, {}
        for role in role_order:
            b0, off = role_base[role], 0
            for n, w, nd in roles[role]:
                def sl(comp):
                    s = u[
                        b0 : b0 + role_rows[role],
                        comp * w_max + off : comp * w_max + off + w,
                    ]
                    return s[:, 0] if nd == 1 else s
                params_out[n] = sl(0)
                moments_out[n] = (sl(1), sl(2))
                off += w
        return params_out, moments_out

    def _pad_cols(t):
        if t.ndim != 2 or t.shape[1] % 128 == 0:
            return t
        return jnp.pad(t, ((0, 0), (0, (-t.shape[1]) % 128)))

    # ---- unified_bf16 layout: only 2-D tables pack (u16 rows); 1-D biases
    # ride the per-table xla path (width-1 rows cannot pay for packing) ----
    roles2 = {
        r: [(n2, w) for n2, w, nd in specs if nd == 2]
        for r, specs in roles.items()
    }
    roles2 = {r: v for r, v in roles2.items() if v}
    role2_order = list(roles2)
    bias_tables = [
        (n2, r) for r, specs in roles.items() for n2, w, nd in specs if nd == 1
    ]
    role2_width = {r: sum(w for _, w in roles2[r]) for r in roles2}
    w_max2 = max(role2_width.values()) if roles2 else 0
    role2_base, _acc2 = {}, 0
    for r in role2_order:
        role2_base[r] = _acc2
        _acc2 += role_rows[r]
    total_rows2 = _acc2

    def _pack16(params, moments):
        """(total_rows2, 4*w_max2) uint16 rows [p_hi|p_lo|m_bf16|v_bf16]."""
        u = jnp.zeros((total_rows2, 4 * w_max2), jnp.uint16)
        for role in role2_order:
            b0, off = role2_base[role], 0
            for n2, w in roles2[role]:
                pu = jax.lax.bitcast_convert_type(params[n2], jnp.uint32)
                m0, v0 = moments[n2]
                comps = (
                    (pu >> 16).astype(jnp.uint16),
                    (pu & jnp.uint32(0xFFFF)).astype(jnp.uint16),
                    jax.lax.bitcast_convert_type(m0.astype(jnp.bfloat16), jnp.uint16),
                    jax.lax.bitcast_convert_type(v0.astype(jnp.bfloat16), jnp.uint16),
                )
                for c, s in enumerate(comps):
                    u = u.at[
                        b0 : b0 + role_rows[role],
                        c * w_max2 + off : c * w_max2 + off + w,
                    ].set(s)
                off += w
        return u

    def _unpack16_components(rows16):
        """u16 rows -> fp32 (p, m, v); exact for p, bf16-rounded for m/v."""
        hi = rows16[:, :w_max2].astype(jnp.uint32)
        lo = rows16[:, w_max2 : 2 * w_max2].astype(jnp.uint32)
        p = jax.lax.bitcast_convert_type((hi << 16) | lo, jnp.float32)
        m = jax.lax.bitcast_convert_type(
            rows16[:, 2 * w_max2 : 3 * w_max2], jnp.bfloat16
        ).astype(jnp.float32)
        v = jax.lax.bitcast_convert_type(
            rows16[:, 3 * w_max2 :], jnp.bfloat16
        ).astype(jnp.float32)
        return p, m, v

    def _repack16(p, m, v):
        pu = jax.lax.bitcast_convert_type(p, jnp.uint32)
        return jnp.concatenate(
            [
                (pu >> 16).astype(jnp.uint16),
                (pu & jnp.uint32(0xFFFF)).astype(jnp.uint16),
                jax.lax.bitcast_convert_type(m.astype(jnp.bfloat16), jnp.uint16),
                jax.lax.bitcast_convert_type(v.astype(jnp.bfloat16), jnp.uint16),
            ],
            axis=1,
        )

    def _unpack16(u, params_in, moments_in):
        """Full-table unpack at epoch end; bias tables pass through."""
        params_out = dict(params_in)
        moments_out = dict(moments_in)
        for role in role2_order:
            b0, off = role2_base[role], 0
            rows16 = u[b0 : b0 + role_rows[role]]
            p, m, v = _unpack16_components(rows16)
            for n2, w in roles2[role]:
                params_out[n2] = p[:, off : off + w]
                moments_out[n2] = (m[:, off : off + w], v[:, off : off + w])
                off += w
        return params_out, moments_out

    def epoch_fn(params, opt_state, rng):
        from .train_engine import _padded_order

        sparse_state, dense_state = opt_state
        rng, perm_key, k_neg, k_epoch = jax.random.split(rng, 4)
        # Form the whole epoch's batches here, NOT in the scan body: in-loop
        # narrow gathers + threefry cost 100s of µs/step, and scatter operands
        # derived from in-loop gathers bounce through scratch memory (see
        # make_epoch_fn). With xs batches the row updates run at O(batch) cost.
        order = _padded_order(jax.random.permutation(perm_key, n), padded_size)
        u_all = users[order]
        pos_all = items[order]
        neg_all = neg_sampler(k_neg, u_all, (padded_size,))
        xs = (
            u_all.reshape(num_batches, batch_size),
            pos_all.reshape(num_batches, batch_size),
            neg_all.reshape(num_batches, batch_size),
            jax.random.split(k_epoch, num_batches),
        )

        if row_update == "unified":
            b1, b2, eps = 0.9, 0.999, 1e-8
            dense_params0 = {k: v for k, v in params.items() if k not in table_names}
            u0 = _pack_unified(params, sparse_state["moments"])

            def ustep(carry, x):
                uarr, dense_params, step_i, dense_state = carry
                u, pos, neg, k_loss = x
                batch = {"users": u, "pos_items": pos, "neg_items": neg}
                role_ids = {"users": u, "items_cat": jnp.concatenate([pos, neg])}

                # concat every role's ids (offset to its row block): one
                # gather / sort / scatter serves ALL tables this step
                seg, parts, s0 = [], [], 0
                for role in role_order:
                    ids_r = role_ids[role]
                    parts.append(ids_r + role_base[role])
                    seg.append((role, s0, s0 + ids_r.shape[0]))
                    s0 += ids_r.shape[0]
                ids_u = jnp.concatenate(parts)
                L = ids_u.shape[0]
                rows_full = uarr[ids_u]  # (L, 3*w_max): ONE full-row gather
                prow = rows_full[:, :w_max]

                def _rows_of(prow):
                    rows = {}
                    for role, a, b in seg:
                        off = 0
                        for n, w, nd in roles[role]:
                            sl = prow[a:b, off : off + w]
                            rows[n] = sl[:, 0] if nd == 1 else sl
                            off += w
                    return rows

                # Differentiate w.r.t. the single (L, w_max) row tensor, NOT a
                # dict of slices: the cotangent lands directly in the unified
                # layout (no per-table concat/pad reassembly ops in the step).
                def loss_fn(prow, dense_params):
                    rows = _rows_of(prow)
                    if compute_dtype is not None:
                        dt = jnp.dtype(compute_dtype)
                        cast = lambda t: jax.tree_util.tree_map(
                            lambda x: x.astype(dt)
                            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
                            else x,
                            t,
                        )
                        return model.row_loss(
                            cast(rows), cast(dense_params), batch, k_loss
                        ).astype(jnp.float32)
                    return model.row_loss(rows, dense_params, batch, k_loss)

                loss, (g_cat, g_dense) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
                    prow, dense_params
                )

                # shared sort + segment dedup (duplicates sum at the first
                # occurrence; later occurrences carry zero rows)
                order2 = jnp.argsort(ids_u)
                ids_s = ids_u[order2]
                g_sorted = g_cat[order2]
                first = jnp.concatenate(
                    [jnp.array([True]), ids_s[1:] != ids_s[:-1]]
                )
                segid = jnp.cumsum(first) - 1
                summed = jax.ops.segment_sum(g_sorted, segid, num_segments=L)
                g_d = jnp.where(first[:, None], summed[segid], 0.0)
                rows_s = rows_full[order2]  # permute the gathered buffer

                m_r = rows_s[:, w_max : 2 * w_max]
                v_r = rows_s[:, 2 * w_max :]
                new_step = step_i + 1
                step_f = new_step.astype(jnp.float32)
                m_new = b1 * m_r + (1 - b1) * g_d
                v_new = b2 * v_r + (1 - b2) * g_d**2
                m_hat = m_new / (1 - b1**step_f)
                v_hat = v_new / (1 - b2**step_f)
                delta = -lr * m_hat / (jnp.sqrt(v_hat) + eps)

                # per-TABLE lazy "touched" masks (exact XLA-path semantics):
                # per-table any-nonzero over that table's column slice of the
                # deduped g. When every role has the same column boundaries
                # (e.g. MF: [emb|bias] on both sides) a row's slice belongs to
                # exactly one table for ANY role, so no role-membership
                # indicator is needed — this saves ~10 ops/step in the scan
                # body, where fixed per-op cost dominates at these shapes.
                same_boundaries = len(
                    {tuple(w for _, w, _ in roles[r]) for r in role_order}
                ) == 1
                if same_boundaries:
                    off, blocks = 0, []
                    for n, w, nd in roles[role_order[0]]:
                        t = jnp.any(g_d[:, off : off + w] != 0, axis=1, keepdims=True)
                        blocks.append(jnp.broadcast_to(t.astype(jnp.float32), (L, w)))
                        off += w
                    pad = w_max - role_width[role_order[0]]
                    if pad:
                        blocks.append(jnp.zeros((L, pad), jnp.float32))
                    mask = jnp.concatenate(blocks, axis=1)
                else:
                    # role membership from the sorted ids' row-block
                    mask = jnp.zeros((L, w_max), jnp.float32)
                    for role in role_order:
                        b0 = role_base[role]
                        ind = (
                            (ids_s >= b0) & (ids_s < b0 + role_rows[role])
                        ).astype(jnp.float32)[:, None]
                        off, blocks = 0, []
                        for n, w, nd in roles[role]:
                            t = jnp.any(g_d[:, off : off + w] != 0, axis=1, keepdims=True)
                            blocks.append(
                                jnp.broadcast_to(t.astype(jnp.float32), (L, w))
                            )
                            off += w
                        pad = w_max - role_width[role]
                        if pad:
                            blocks.append(jnp.zeros((L, pad), jnp.float32))
                        mask = mask + ind * jnp.concatenate(blocks, axis=1)

                upd = jnp.concatenate(
                    [mask * delta, mask * (m_new - m_r), mask * (v_new - v_r)],
                    axis=1,
                )  # (L, 3*w_max)
                dropped_inc = jnp.zeros((), jnp.int32)
                if compact and compact_capacity < L:
                    # first-occurrence rows to the front (stable: keeps
                    # sorted-id order); duplicates carry zero rows, so
                    # scattering only the first C entries loses nothing
                    # until unique_count > C — those drops are counted.
                    order3 = jnp.argsort(~first, stable=True)
                    sel = order3[:compact_capacity]
                    n_unique = jnp.sum(first).astype(jnp.int32)
                    dropped_inc = jnp.maximum(
                        n_unique - jnp.int32(compact_capacity), 0
                    )
                    # NOT indices_are_sorted: profiled 5x slower on v5e.
                    uarr = uarr.at[ids_s[sel]].add(upd[sel])
                else:
                    # NOT indices_are_sorted=True: profiled 5x SLOWER at
                    # B=8192 on v5e (tools/prof_scatter_rows.py) — XLA picks
                    # a worse lowering for the sorted hint at this shape.
                    uarr = uarr.at[ids_s].add(upd)  # ONE scatter-add

                updates, dense_state = dense_optimizer.update(
                    g_dense, dense_state, dense_params
                )
                dense_params = optax.apply_updates(dense_params, updates)
                return (uarr, dense_params, new_step, dense_state), (loss, dropped_inc)

            (uarr, dense_params, step_i, dense_state), (losses, drops) = jax.lax.scan(
                ustep, (u0, dense_params0, sparse_state["step"], dense_state), xs
            )
            params_out, moments_out = _unpack_unified(uarr)
            params_out.update(dense_params)
            return (
                params_out,
                ({"moments": moments_out, "step": step_i,
                  "dropped": sparse_state.get("dropped", jnp.zeros((), jnp.int32))
                  + jnp.sum(drops)},
                 dense_state),
                rng,
                jnp.mean(losses),
            )

        if row_update == "unified_bf16" and roles2:
            b1, b2, eps = 0.9, 0.999, 1e-8
            dense_params0 = {k: v for k, v in params.items() if k not in table_names}
            bias_params0 = {n2: params[n2] for n2, _ in bias_tables}
            bias_moments0 = {n2: sparse_state["moments"][n2] for n2, _ in bias_tables}
            emb_moments0 = {
                n2: sparse_state["moments"][n2]
                for r in role2_order for n2, _ in roles2[r]
            }
            u0 = _pack16(params, emb_moments0)

            def bstep(carry, x):
                uarr, bias_params, bias_moments, dense_params, step_i, dense_state = carry
                u, pos, neg, k_loss = x
                batch = {"users": u, "pos_items": pos, "neg_items": neg}
                role_ids = {"users": u, "items_cat": jnp.concatenate([pos, neg])}

                seg, parts, s0 = [], [], 0
                for role in role2_order:
                    ids_r = role_ids[role]
                    parts.append(ids_r + role2_base[role])
                    seg.append((role, s0, s0 + ids_r.shape[0]))
                    s0 += ids_r.shape[0]
                ids_u = jnp.concatenate(parts)
                L = ids_u.shape[0]
                rows16 = uarr[ids_u]  # (L, 4*w_max2): ONE u16 full-row gather
                prow, _, _ = _unpack16_components(rows16)
                bias_rows = {
                    n2: bias_params[n2][role_ids[r]] for n2, r in bias_tables
                }

                def _rows_of(prow, bias_rows):
                    rows = dict(bias_rows)
                    for role, a, b in seg:
                        off = 0
                        for n2, w in roles2[role]:
                            rows[n2] = prow[a:b, off : off + w]
                            off += w
                    return rows

                def loss_fn(prow, bias_rows, dense_params):
                    rows = _rows_of(prow, bias_rows)
                    if compute_dtype is not None:
                        dt = jnp.dtype(compute_dtype)
                        cast = lambda t: jax.tree_util.tree_map(
                            lambda x: x.astype(dt)
                            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
                            else x,
                            t,
                        )
                        return model.row_loss(
                            cast(rows), cast(dense_params), batch, k_loss
                        ).astype(jnp.float32)
                    return model.row_loss(rows, dense_params, batch, k_loss)

                loss, (g_cat, g_bias, g_dense) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1, 2)
                )(prow, bias_rows, dense_params)

                # shared sort + segment dedup over the packed ids
                order2 = jnp.argsort(ids_u)
                ids_s = ids_u[order2]
                g_sorted = g_cat[order2]
                first = jnp.concatenate([jnp.array([True]), ids_s[1:] != ids_s[:-1]])
                segid = jnp.cumsum(first) - 1
                summed = jax.ops.segment_sum(g_sorted, segid, num_segments=L)
                g_d = jnp.where(first[:, None], summed[segid], 0.0)
                rows16_s = rows16[order2]  # permute the u16 buffer (half bytes)
                p_s, m_s, v_s = _unpack16_components(rows16_s)

                new_step = step_i + 1
                step_f = new_step.astype(jnp.float32)
                m_new = b1 * m_s + (1 - b1) * g_d
                v_new = b2 * v_s + (1 - b2) * g_d**2
                m_hat = m_new / (1 - b1**step_f)
                v_hat = v_new / (1 - b2**step_f)
                delta = -lr * m_hat / (jnp.sqrt(v_hat) + eps)

                # per-table touched masks (unified-path semantics)
                same_boundaries = len(
                    {tuple(w for _, w in roles2[r]) for r in role2_order}
                ) == 1
                if same_boundaries:
                    off, blocks = 0, []
                    for n2, w in roles2[role2_order[0]]:
                        t = jnp.any(g_d[:, off : off + w] != 0, axis=1, keepdims=True)
                        blocks.append(jnp.broadcast_to(t.astype(jnp.float32), (L, w)))
                        off += w
                    pad = w_max2 - role2_width[role2_order[0]]
                    if pad:
                        blocks.append(jnp.zeros((L, pad), jnp.float32))
                    mask = jnp.concatenate(blocks, axis=1)
                else:
                    mask = jnp.zeros((L, w_max2), jnp.float32)
                    for role in role2_order:
                        b0 = role2_base[role]
                        ind = (
                            (ids_s >= b0) & (ids_s < b0 + role_rows[role])
                        ).astype(jnp.float32)[:, None]
                        off, blocks = 0, []
                        for n2, w in roles2[role]:
                            t = jnp.any(g_d[:, off : off + w] != 0, axis=1, keepdims=True)
                            blocks.append(jnp.broadcast_to(t.astype(jnp.float32), (L, w)))
                            off += w
                        pad = w_max2 - role2_width[role]
                        if pad:
                            blocks.append(jnp.zeros((L, pad), jnp.float32))
                        mask = mask + ind * jnp.concatenate(blocks, axis=1)

                # untouched slices keep their exact bytes (p round-trips
                # bit-exactly; m/v are already bf16-rounded)
                p_new = p_s + mask * delta
                m_wr = jnp.where(mask > 0, m_new, m_s)
                v_wr = jnp.where(mask > 0, v_new, v_s)
                new_rows16 = _repack16(p_new, m_wr, v_wr)
                # scatter-SET: only first occurrences write (duplicates route
                # out of bounds -> dropped), preserving dedup semantics with
                # no extra row pass
                ids_write = jnp.where(first, ids_s, total_rows2)
                uarr = uarr.at[ids_write].set(new_rows16, mode="drop")

                # bias tables: per-table lazy-Adam (xla path)
                new_bias_params = dict(bias_params)
                new_bias_moments = dict(bias_moments)
                for n2, r in bias_tables:
                    mb, vb = bias_moments[n2]
                    tb, mb2, vb2 = sparse_adam_row_update(
                        bias_params[n2], mb, vb, role_ids[r], g_bias[n2], lr, step_f
                    )
                    new_bias_params[n2] = tb
                    new_bias_moments[n2] = (mb2, vb2)

                updates, dense_state = dense_optimizer.update(
                    g_dense, dense_state, dense_params
                )
                dense_params = optax.apply_updates(dense_params, updates)
                return (
                    uarr, new_bias_params, new_bias_moments, dense_params,
                    new_step, dense_state,
                ), loss

            (uarr, bias_params, bias_moments, dense_params, step_i, dense_state), losses = jax.lax.scan(
                bstep,
                (u0, bias_params0, bias_moments0, dense_params0,
                 sparse_state["step"], dense_state),
                xs,
            )
            params_out, moments_out = _unpack16(uarr, bias_params, bias_moments)
            params_out.update(dense_params)
            return (
                params_out,
                ({"moments": moments_out, "step": step_i,
                  "dropped": sparse_state.get("dropped", jnp.zeros((), jnp.int32))},
                 dense_state),
                rng,
                jnp.mean(losses),
            )

        orig_width = {k: params[k].shape[-1] if params[k].ndim == 2 else None
                      for k in table_names}
        if row_update == "fused":
            # one-time per epoch: pad 2-D tables + moments to 128-wide rows
            params = {k: (_pad_cols(v) if k in table_names else v)
                      for k, v in params.items()}
            moments0 = {
                k: (_pad_cols(m0), _pad_cols(v0))
                for k, (m0, v0) in sparse_state["moments"].items()
            }
            sparse_state = {"moments": moments0, "step": sparse_state["step"],
                            "dropped": sparse_state.get("dropped", jnp.zeros((), jnp.int32))}

        def step(carry, x):
            params, sparse_state, dense_state = carry
            u, pos, neg, k_loss = x
            batch = {"users": u, "pos_items": pos, "neg_items": neg}
            role_ids = {
                "users": u,
                "items_cat": jnp.concatenate([pos, neg]),
            }

            rows = {name: params[name][role_ids[table_roles[name]]] for name in table_names}
            dense_params = {k: v for k, v in params.items() if k not in table_names}

            def loss_fn(rows, dense_params):
                if compute_dtype is not None:
                    # Mixed precision: gathered rows + dense params compute in
                    # bf16; grads come back fp32 through astype's VJP, so the
                    # fp32 lazy-Adam moments are untouched.
                    dt = jnp.dtype(compute_dtype)
                    cast = lambda t: jax.tree_util.tree_map(
                        lambda x: x.astype(dt)
                        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
                        else x,
                        t,
                    )
                    return model.row_loss(cast(rows), cast(dense_params), batch, k_loss).astype(jnp.float32)
                return model.row_loss(rows, dense_params, batch, k_loss)

            loss, (g_rows, g_dense) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
                rows, dense_params
            )

            new_step = sparse_state["step"] + 1
            step_f = new_step.astype(jnp.float32)
            moments = dict(sparse_state["moments"])
            for name in table_names:
                m, v = moments[name]
                ids_t = role_ids[table_roles[name]]
                g_t = g_rows[name]
                if row_update == "fused" and params[name].ndim == 2:
                    from ..ops.pallas.rowadam import fused_rowadam

                    ids_s, g_d = _segment_dedup(ids_t, g_t)
                    bc = jnp.stack(
                        [1.0 / (1.0 - 0.9**step_f), 1.0 / (1.0 - 0.999**step_f)]
                    )
                    table, m, v = fused_rowadam(
                        params[name], m, v, ids_s, g_d, bc, lr
                    )
                else:
                    table, m, v = sparse_adam_row_update(
                        params[name], m, v, ids_t, g_t, lr, step_f
                    )
                params = {**params, name: table}
                moments[name] = (m, v)
            # single-device path never drops gradient; carry the counter
            sparse_state = {"moments": moments, "step": new_step,
                            "dropped": sparse_state["dropped"]}

            updates, dense_state = dense_optimizer.update(
                g_dense, dense_state, dense_params
            )
            dense_params = optax.apply_updates(dense_params, updates)
            params = {**params, **dense_params}
            return (params, sparse_state, dense_state), loss

        (params, sparse_state, dense_state), losses = jax.lax.scan(
            step, (params, sparse_state, dense_state), xs
        )
        if row_update == "fused":
            # trim the 128-alignment pad columns back off
            def _trim(name, t):
                w = orig_width[name]
                return t[:, :w] if (w is not None and t.shape[-1] != w) else t

            params = {k: (_trim(k, v) if k in table_names else v)
                      for k, v in params.items()}
            sparse_state = {
                "moments": {
                    k: (_trim(k, m0), _trim(k, v0))
                    for k, (m0, v0) in sparse_state["moments"].items()
                },
                "step": sparse_state["step"],
                "dropped": sparse_state["dropped"],
            }
        return params, (sparse_state, dense_state), rng, jnp.mean(losses)

    return jax.jit(epoch_fn, donate_argnums=(0, 1) if donate else ())


# ---------------------------------------------------------------------------
# Multi-chip sparse training: row-sharded tables + lazy-Adam shard updates
# ---------------------------------------------------------------------------


def pad_rows(arr, multiple):
    """Pad a table's leading dim to a multiple (pad rows are never touched)."""
    n = arr.shape[0]
    target = -(-n // multiple) * multiple
    if target == n:
        return arr
    pad = [(0, target - n)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, pad)


def shard_sparse_params(params, table_names, mesh):
    """Pad row tables to the model-axis size and place them row-sharded;
    everything else replicates. Returns the placed params pytree."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import MODEL_AXIS

    n_model = mesh.shape[MODEL_AXIS]
    out = {}
    for k, v in params.items():
        if k in table_names:
            v = pad_rows(v, n_model)
            spec = P(MODEL_AXIS) if v.ndim == 1 else P(MODEL_AXIS, None)
        else:
            spec = P()
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def _bucket_by_owner(ids, rows, n_model, rows_per, capacity, shard_idx):
    """Compact the rows of ``ids`` owned by model shard ``shard_idx`` into a
    fixed-capacity bucket: returns (local_row_ids (C,), rows (C, d), dropped).

    Empty/overflow slots carry zero rows (no-ops downstream: the lazy-Adam
    update masks untouched rows). Overflow — more than C owned rows in one
    shard's batch — drops gradient; callers size C with a capacity factor and
    should dedup first so C bounds UNIQUE owned ids. ``dropped`` (int32
    scalar) counts the overflowed rows so the loss is observable instead of
    silent (r3 advisor / VERDICT #5); power-law id distributions concentrate
    unique ids on one shard, exactly the case that overflows.
    """
    loc = ids - shard_idx * rows_per
    touched = jnp.any(rows != 0, axis=1)
    mine = (loc >= 0) & (loc < rows_per) & touched
    slot = jnp.cumsum(mine) - 1
    write = jnp.where(mine & (slot < capacity), slot, capacity)
    buf_ids = jnp.zeros((capacity + 1,), ids.dtype).at[write].set(
        jnp.clip(loc, 0, rows_per - 1), mode="drop"
    )
    buf_rows = jnp.zeros((capacity + 1, rows.shape[1]), rows.dtype).at[write].set(
        jnp.where(mine[:, None], rows, 0.0), mode="drop"
    )
    dropped = jnp.maximum(jnp.sum(mine.astype(jnp.int32)) - capacity, 0)
    return buf_ids[:capacity], buf_rows[:capacity], dropped


def make_sharded_sparse_epoch_fn(model, train_arrays, batch_size, neg_sampler, lr, mesh, dense_optimizer=None, donate=True, compute_dtype=None, lookup_strategy="psum", grad_exchange="allgather", capacity_factor=2.0):
    """Multi-chip whole-epoch sparse trainer (the BASELINE.json north star).

    Embedding tables AND their lazy-Adam moments are row-sharded over the
    "model" mesh axis; batches shard over "data". One shard_map per step:

      forward   — ``lookup_strategy``:
                  * "psum" (default): each (data, model) device gathers its
                    batch shard's hits in its table shard; a psum over "model"
                    completes the rows (the collective of
                    parallel.embedding.psum_gather_sharded_batch). Per-device
                    bytes ~2*B_local*d (all-reduce = reduce + broadcast legs).
                  * "ring": bucket owned rows (capacity C = ceil(B_local /
                    n_model) * capacity_factor) and ride the Pallas ring
                    all-gather (ops/pallas/ring_exchange.py) — each byte
                    crosses each ICI link once; per-device bytes
                    ~capacity_factor*B_local*d.
      backward  — row gradients are taken w.r.t. the GATHERED rows; then
                  ``grad_exchange``:
                  * "allgather" (default, exact): all_gather over "data" of
                    every shard's (ids, grad-rows) — O(B*d) received per
                    device; each model shard scatter-updates its owned rows.
                  * "bucketed": dedup locally, keep only rows THIS model shard
                    owns (capacity C2 = ceil(B_local / n_model) *
                    capacity_factor), all_gather over "data" of the small
                    buckets — O(B*d*capacity_factor/n_model) received,
                    n_model/capacity_factor x less wire traffic. Unique owned
                    ids beyond C2 drop their gradient for that step (size
                    capacity_factor for skew; see _bucket_by_owner).
                  Table-sized arrays never cross the ICI either way.
      optimizer — lazy-Adam per owned row (sparse_adam_row_update, duplicate
                  ids across data shards summed by its segment dedup — exactly
                  the single-device semantics); dense params update replicated
                  with the psum-averaged gradient.

    Gradient parity with the single-device make_sparse_epoch_fn is exact up to
    float reassociation (pinned in tests/test_sharded_sparse.py) for the
    default strategies: the local per-shard means are rescaled by 1/n_data so
    their dedup-sum equals the global batch mean. "bucketed"/"ring" trade
    bounded approximation (capacity overflow) for wire bytes; parity at
    adequate capacity is pinned in tests too.

    Per-step collective bytes for every strategy combination are measurable
    without hardware via parallel.comm_analysis.collective_bytes.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS, MODEL_AXIS
    from .train_engine import _padded_order

    users = jnp.asarray(train_arrays.users)
    items = jnp.asarray(train_arrays.items)
    n = users.shape[0]
    n_data = mesh.shape[DATA_AXIS]
    batch_size = min(batch_size, n)
    batch_size = max(batch_size // n_data, 1) * n_data
    num_batches = -(-n // batch_size)
    padded_size = num_batches * batch_size
    table_roles = model.row_tables()
    table_names = list(table_roles)
    dense_optimizer = dense_optimizer or optax.adam(lr)

    params_shape = jax.eval_shape(model.init_params, jax.random.key(0))
    def _tspec(name, leaf):
        if name in table_names:
            return P(MODEL_AXIS) if len(leaf.shape) == 1 else P(MODEL_AXIS, None)
        return P()
    param_specs = {k: _tspec(k, v) for k, v in params_shape.items()}
    moment_specs = {k: (param_specs[k], param_specs[k]) for k in table_names}

    n_model = mesh.shape[MODEL_AXIS]

    def _capacity_for(n_ids):
        cap = max(int(-(-n_ids // n_model) * capacity_factor), 1)
        return -(-cap // 8) * 8  # sublane alignment for ring blocks

    # ONE bucketing/gather implementation serves both the standalone lookup
    # API and this trainer (VERDICT r3 #9): the inside-shard_map primitives
    # live in parallel.embedding.
    from ..parallel.embedding import local_psum_gather, local_ring_gather

    def _gather(local_table, ids, collective_id):
        # ring lookup is 2-D tables only; 1-D bias tables use the psum path —
        # their rows are 4 bytes, bucketing cannot pay
        if lookup_strategy == "ring" and local_table.ndim == 2 and n_model > 1:
            return local_ring_gather(
                local_table, ids, n_model, _capacity_for(ids.shape[0]),
                collective_id,
            )
        return local_psum_gather(local_table, ids)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            param_specs,
            moment_specs,
            P(),            # step counter
            P(),            # dense optimizer state
            P(DATA_AXIS),   # users
            P(DATA_AXIS),   # pos items
            P(DATA_AXIS),   # neg items
            P(),            # rng key
        ),
        out_specs=(param_specs, moment_specs, P(), P(), P(), P()),
        check_vma=False,    # dense path is replicated by construction (psum'd
                            # grads + identical optax update on every device)
    )
    def sharded_step(params, moments, step_i, dense_state, u, pos, neg, key):
        batch = {"users": u, "pos_items": pos, "neg_items": neg}
        role_ids = {"users": u, "items_cat": jnp.concatenate([pos, neg])}
        rows = {
            name: _gather(params[name], role_ids[table_roles[name]], 2 + i)
            for i, name in enumerate(table_names)
        }
        dense_params = {k: v for k, v in params.items() if k not in table_names}

        def loss_fn(rows, dense_params):
            if compute_dtype is not None:
                dt = jnp.dtype(compute_dtype)
                cast = lambda t: jax.tree_util.tree_map(
                    lambda x: x.astype(dt)
                    if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
                    else x,
                    t,
                )
                return model.row_loss(cast(rows), cast(dense_params), batch, key).astype(jnp.float32)
            return model.row_loss(rows, dense_params, batch, key)

        loss, (g_rows, g_dense) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            rows, dense_params
        )
        # local means -> global batch mean
        g_dense = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, DATA_AXIS) / n_data, g_dense
        )
        loss_g = jax.lax.psum(loss, DATA_AXIS) / n_data
        new_step = step_i + 1
        new_params = dict(params)
        new_moments = dict(moments)
        dropped = jnp.zeros((), jnp.int32)
        for name in table_names:
            local_table = params[name]
            m, v = moments[name]
            rows_per = local_table.shape[0]
            ids_local = role_ids[table_roles[name]]
            g_local = g_rows[name] / n_data  # local mean -> global batch mean
            if grad_exchange == "bucketed":
                # dedup first so the bucket capacity bounds UNIQUE owned ids,
                # then ship only this model shard's rows over "data"
                g2 = g_local if g_local.ndim == 2 else g_local[:, None]
                ids_d, g_d = _segment_dedup(ids_local, g2)
                cap_t = _capacity_for(ids_local.shape[0])
                b_ids, b_rows, drop_t = _bucket_by_owner(
                    ids_d, g_d, n_model, rows_per, cap_t,
                    jax.lax.axis_index(MODEL_AXIS),
                )
                dropped = dropped + drop_t
                safe = jax.lax.all_gather(b_ids, DATA_AXIS, tiled=True)
                g_masked = jax.lax.all_gather(b_rows, DATA_AXIS, tiled=True)
                if g_local.ndim == 1:
                    g_masked = g_masked[:, 0]
            else:
                ids_all = jax.lax.all_gather(ids_local, DATA_AXIS, tiled=True)
                g_all = jax.lax.all_gather(g_local, DATA_AXIS, tiled=True)
                loc = ids_all - jax.lax.axis_index(MODEL_AXIS) * rows_per
                ok = (loc >= 0) & (loc < rows_per)
                safe = jnp.clip(loc, 0, rows_per - 1)
                mask = ok[..., None] if g_all.ndim > ok.ndim else ok
                g_masked = jnp.where(mask, g_all, 0.0)
            t2, m2, v2 = sparse_adam_row_update(
                local_table, m, v, safe, g_masked, lr, new_step.astype(jnp.float32)
            )
            new_params[name] = t2
            new_moments[name] = (m2, v2)
        updates, dense_state = dense_optimizer.update(g_dense, dense_state, dense_params)
        new_params.update(optax.apply_updates(dense_params, updates))
        # total drops this step = sum over every (data, model) device's bucket
        dropped = jax.lax.psum(jax.lax.psum(dropped, MODEL_AXIS), DATA_AXIS)
        return new_params, new_moments, new_step, dense_state, loss_g, dropped

    def epoch_fn(params, opt_state, rng):
        sparse_state, dense_state = opt_state
        rng, perm_key, k_neg, k_epoch = jax.random.split(rng, 4)
        # Whole-epoch batch formation, as in make_sparse_epoch_fn: xs batches
        # keep the sharded step body pure compute + collectives.
        order = _padded_order(jax.random.permutation(perm_key, n), padded_size)
        u_all = users[order]
        pos_all = items[order]
        neg_all = neg_sampler(k_neg, u_all, (padded_size,))
        xs = (
            u_all.reshape(num_batches, batch_size),
            pos_all.reshape(num_batches, batch_size),
            neg_all.reshape(num_batches, batch_size),
            jax.random.split(k_epoch, num_batches),
        )

        def step(carry, x):
            params, moments, step_i, dense_state = carry
            u, pos, neg, k_loss = x
            params, moments, step_i, dense_state, loss, drops = sharded_step(
                params, moments, step_i, dense_state, u, pos, neg, k_loss
            )
            return (params, moments, step_i, dense_state), (loss, drops)

        init = (params, sparse_state["moments"], sparse_state["step"], dense_state)
        (params, moments, step_i, dense_state), (losses, drops) = jax.lax.scan(
            step, init, xs
        )
        new_state = (
            {"moments": moments, "step": step_i,
             "dropped": sparse_state.get("dropped", jnp.zeros((), jnp.int32))
             + jnp.sum(drops)},
            dense_state,
        )
        return params, new_state, rng, jnp.mean(losses)

    return jax.jit(epoch_fn, donate_argnums=(0, 1) if donate else ())
