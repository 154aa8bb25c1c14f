"""Decompose + attack the full-catalog retrieval path (VERDICT r4 #3).

r4 shipped retrieval_10k_users_162k_items at 45.8k users/s = 0.23% of HBM
peak / ~0.5% MXU with no decomposition. This tool measures, on the real chip:

  A. matmul-only sweep (score every block, reduce to a scalar — no top-k)
  B. the r4 streaming_topk path as benched (exclusion mask + per-block merge)
  C. exclusion cost: (B, n_items) bool mask scatter vs scatter-into-scores
  D. per-block exact top_k vs approx_max_k (TPU PartialReduce) + final merge
  E. bf16 scoring matmul
  F. block-size sweep (user_block x item_block)

Run: python tools/prof_retrieval.py   (single TPU client — serialize!)
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

N_USERS, N_ITEMS, D, K = 10_240, 162_000, 64, 10


def _rtt():
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1)
    float(f(jnp.ones(())))
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(f(jnp.ones(())))
        ts.append(time.time() - t0)
    return min(ts)


def timeit(fn, n=3):
    out = fn()
    import jax

    jax.device_get(out)
    rtt = _rtt()
    t0 = time.time()
    for _ in range(n):
        out = fn()
    jax.device_get(out)
    return max((time.time() - t0 - rtt) / n, 1e-9)


def main():
    global D
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from beta_recsys_tpu.models.mf import MF
    from beta_recsys_tpu.ops.topk import streaming_topk

    rng = np.random.default_rng(0)
    model = MF({"model": "MF", "emb_dim": D, "loss": "bpr"}, N_USERS, N_ITEMS)
    params = model.init_params(jax.random.key(0))
    u_emb, i_emb = model.user_item_embeddings_trimmed(params)
    u_emb = jnp.asarray(u_emb)
    i_emb = jnp.asarray(i_emb)
    D = int(i_emb.shape[1])  # model embeddings carry bias columns (66 wide)
    rows = np.repeat(np.arange(N_USERS), 20)
    cols = rng.integers(0, N_ITEMS, N_USERS * 20)

    results = {}
    flops = N_USERS * N_ITEMS * D * 2

    # ---- A: matmul-only (scalar reduce; user_block sweep) ----
    for ub in (1024, 2048, 10_240):
        @jax.jit
        def matmul_only(u, it):
            def blk(s, carry):
                ub_ = jax.lax.dynamic_slice(u, (s * 1024, 0), (1024, D))
                return carry + (ub_ @ it.T).max()
            return jax.lax.fori_loop(0, u.shape[0] // 1024, blk, 0.0) if ub == 1024 \
                else (u @ it.T).max()
        if ub == 10_240:
            t = timeit(lambda: matmul_only(u_emb, i_emb))
        else:
            continue
        results[f"A_matmul_only_full"] = {
            "sec": t, "users_per_sec": N_USERS / t,
            "tflops": flops / t / 1e12,
        }

    # matmul in blocks of (1024 x 8192) with scalar reduce (r4's shape)
    @jax.jit
    def matmul_blocks(u, it):
        nb = N_ITEMS // 8192 + 1
        pad = jnp.zeros((nb * 8192 - N_ITEMS, D), it.dtype)
        itp = jnp.concatenate([it, pad])
        def blk(i, carry):
            v = jax.lax.dynamic_slice(itp, (i * 8192, 0), (8192, D))
            return carry + (u @ v.T).max()
        return jax.lax.fori_loop(0, nb, blk, 0.0)
    t = timeit(lambda: matmul_blocks(u_emb, i_emb))
    results["A_matmul_1024x8192_blocks"] = {"sec": t, "tflops": flops / t / 1e12}

    # ---- B: r4 benched path (mask + streaming merge), one user block ----
    import scipy.sparse as sp

    train_csr = sp.csr_matrix(
        (np.ones(len(rows), np.float32), (rows, cols)), shape=(N_USERS, N_ITEMS))

    @jax.jit
    def r4_block(u_blk, excl_rows, excl_cols):
        excl = jnp.zeros((1024, N_ITEMS), bool).at[excl_rows, excl_cols].set(
            True, mode="drop")
        return streaming_topk(u_blk, i_emb, K, block=8192, exclude_mask=excl)

    sub = train_csr[:1024].tocoo()
    args = (u_emb[:1024], jnp.asarray(sub.row.astype(np.int32)),
            jnp.asarray(sub.col.astype(np.int32)))
    t = timeit(lambda: r4_block(*args))
    results["B_r4_one_block_1024"] = {"sec": t, "sweep_extrapolated": t * 10,
                                      "users_per_sec": 1024 / t}

    # streaming merge WITHOUT exclusion mask
    @jax.jit
    def stream_nomask(u_blk):
        return streaming_topk(u_blk, i_emb, K, block=8192)
    t = timeit(lambda: stream_nomask(u_emb[:1024]))
    results["B_stream_nomask_1024"] = {"sec": t, "users_per_sec": 1024 / t}

    # ---- C: exclusion variants ----
    @jax.jit
    def mask_only(excl_rows, excl_cols):
        return jnp.zeros((1024, N_ITEMS), bool).at[excl_rows, excl_cols].set(
            True, mode="drop").sum()
    t = timeit(lambda: mask_only(args[1], args[2]))
    results["C_mask_scatter_only"] = {"sec": t}

    # ---- D: per-block top-k variants, full 10k sweep in ONE jit ----
    # Exclusion by POST-FILTER: retrieve top (K + T_max) unfiltered, then
    # knock out each user's train items with a (B, K+T, T) compare — exact
    # because a user has at most T_max=20 excluded items, so the valid top-K
    # always survives in the top (K+T_max) buffer. No (B, n_items) mask, no
    # element scatters.
    T_MAX = 20

    def make_sweep(block, kind, dtype=None):
        nb = -(-N_ITEMS // block)
        itp = jnp.concatenate(
            [i_emb, jnp.full((nb * block - N_ITEMS, D), 0.0, i_emb.dtype)])
        if dtype is not None:
            itp = itp.astype(dtype)
        kbuf = K + T_MAX

        @jax.jit
        def sweep(u, excl_list):
            uu = u.astype(dtype) if dtype is not None else u

            def blk(carry, i):
                v = jax.lax.dynamic_slice(itp, (i * block, 0), (block, D))
                s = (uu @ v.T).astype(jnp.float32)
                ids = i * block + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(ids < N_ITEMS, s, -1e30)
                if kind == "exact":
                    val, idx = jax.lax.top_k(s, kbuf)
                else:
                    val, idx = jax.lax.approx_max_k(s, kbuf, recall_target=0.95)
                return carry, (val, jnp.take_along_axis(ids, idx, axis=1))

            _, (vals, idxs) = jax.lax.scan(blk, 0.0, jnp.arange(nb))
            # (nb, B, kbuf) -> (B, nb*kbuf) merge, then post-filter exclusions
            vals = jnp.moveaxis(vals, 0, 1).reshape(u.shape[0], -1)
            idxs = jnp.moveaxis(idxs, 0, 1).reshape(u.shape[0], -1)
            fv, fi = jax.lax.top_k(vals, kbuf)
            fidx = jnp.take_along_axis(idxs, fi, axis=1)
            hit = (fidx[:, :, None] == excl_list[:, None, :]).any(-1)
            fv = jnp.where(hit, -1e30, fv)
            gv, gi = jax.lax.top_k(fv, K)
            return gv, jnp.take_along_axis(fidx, gi, axis=1)

        return sweep

    # per-user padded exclusion lists (B, T_MAX)
    excl_list = np.full((N_USERS, T_MAX), -1, np.int32)
    counts = np.zeros(N_USERS, np.int64)
    for r, c in zip(rows, cols):
        if counts[r] < T_MAX:
            excl_list[r, counts[r]] = c
            counts[r] += 1
    excl_list = jnp.asarray(excl_list)

    for label, kind, dtype, block in (
        ("D_exact_8192_fp32", "exact", None, 8192),
        ("D_approx_8192_fp32", "approx", None, 8192),
        ("D_exact_32768_fp32", "exact", None, 32768),
        ("D_approx_32768_fp32", "approx", None, 32768),
        ("E_approx_32768_bf16", "approx", jnp.bfloat16, 32768),
        ("E_exact_32768_bf16", "exact", jnp.bfloat16, 32768),
        ("D_approx_full_162k", "approx", None, 164_864),
        ("E_approx_full_162k_bf16", "approx", jnp.bfloat16, 164_864),
    ):
        try:
            sweep = make_sweep(block, kind, dtype)
            t = timeit(lambda: sweep(u_emb, excl_list))
            results[label] = {
                "sec": t, "users_per_sec": N_USERS / t,
                "tflops": flops / t / 1e12,
                "vs_r4": (N_USERS / t) / 45_820.0,
            }
        except Exception as e:
            results[label] = {"error": repr(e)[:200]}
        print(label, json.dumps(results[label]), flush=True)

    print(json.dumps(results, indent=2))
    with open("parity_runs/prof_retrieval.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
