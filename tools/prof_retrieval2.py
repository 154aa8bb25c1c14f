"""Retrieval round 2: bf16 scores through approx_max_k + recall measurement.

prof_retrieval.py round 1 found: full-catalog approx_max_k + post-filter =
7.8x r4, but the bf16 variant cast scores to fp32 BEFORE the reduce — the
approx top-k reads the materialized score matrix, so its dtype is the
bandwidth lever (6.6 GB fp32 vs 3.3 GB bf16 at 10240 x 162k). This round:
  - scores stay bf16 through approx_max_k (fp32 accumulate in the matmul)
  - recall_target sweep 0.95 / 0.99
  - measured true recall vs the exact top-10 (serving-quality evidence)
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

N_USERS, N_ITEMS, K, T_MAX = 10_240, 162_000, 10, 20


def timeit(fn, n=3):
    import jax

    out = fn()
    jax.device_get(out)
    f = jax.jit(lambda x: x + 1)
    import jax.numpy as jnp
    float(f(jnp.ones(())))
    t0 = time.time(); float(f(jnp.ones(()))); rtt = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = fn()
    jax.device_get(out)
    return max((time.time() - t0 - rtt) / n, 1e-9)


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from beta_recsys_tpu.models.mf import MF

    rng = np.random.default_rng(0)
    model = MF({"model": "MF", "emb_dim": 64, "loss": "bpr"}, N_USERS, N_ITEMS)
    params = model.init_params(jax.random.key(0))
    u_emb, i_emb = model.user_item_embeddings_trimmed(params)
    u_emb, i_emb = jnp.asarray(u_emb), jnp.asarray(i_emb)
    D = int(i_emb.shape[1])
    rows = np.repeat(np.arange(N_USERS), 20)
    cols = rng.integers(0, N_ITEMS, N_USERS * 20)
    excl = np.full((N_USERS, T_MAX), -1, np.int32)
    cnt = np.zeros(N_USERS, np.int64)
    for r, c in zip(rows, cols):
        if cnt[r] < T_MAX:
            excl[r, cnt[r]] = c; cnt[r] += 1
    excl = jnp.asarray(excl)
    kbuf = K + T_MAX
    flops = N_USERS * N_ITEMS * D * 2

    def make(kind, score_dtype, recall=0.95, user_chunk=None):
        it = i_emb.astype(score_dtype)

        def one(u_blk, ex):
            s = (u_blk.astype(score_dtype) @ it.T)
            if kind == "approx":
                val, idx = jax.lax.approx_max_k(s, kbuf, recall_target=recall)
            else:
                val, idx = jax.lax.top_k(s, kbuf)
            hit = (idx[:, :, None] == ex[:, None, :]).any(-1)
            val = jnp.where(hit, jnp.asarray(-1e30, val.dtype), val)
            gv, gi = jax.lax.top_k(val.astype(jnp.float32), K)
            return gv, jnp.take_along_axis(idx, gi, axis=1)

        if user_chunk is None:
            return jax.jit(one)

        @jax.jit
        def chunked(u, ex):
            nb = N_USERS // user_chunk

            def blk(carry, i):
                ub = jax.lax.dynamic_slice(u, (i * user_chunk, 0), (user_chunk, D))
                eb = jax.lax.dynamic_slice(ex, (i * user_chunk, 0), (user_chunk, T_MAX))
                return carry, one(ub, eb)

            _, (v, ix) = jax.lax.scan(blk, 0.0, jnp.arange(nb))
            return v.reshape(N_USERS, K), ix.reshape(N_USERS, K)

        return chunked

    results = {}
    for label, kind, dt, recall, chunk in (
        ("full_approx_bf16scores_r95", "approx", jnp.bfloat16, 0.95, None),
        ("full_approx_bf16scores_r99", "approx", jnp.bfloat16, 0.99, None),
        ("full_approx_fp32_r95", "approx", jnp.float32, 0.95, None),
        ("chunk2048_approx_bf16_r95", "approx", jnp.bfloat16, 0.95, 2048),
        ("full_exact_fp32", "exact", jnp.float32, None, None),
    ):
        try:
            fn = make(kind, dt, recall or 0.95, chunk)
            t = timeit(lambda: fn(u_emb, excl))
            results[label] = {"sec": t, "users_per_sec": N_USERS / t,
                              "tflops": flops / t / 1e12,
                              "vs_r4": (N_USERS / t) / 45_820.0}
        except Exception as e:
            results[label] = {"error": repr(e)[:200]}
        print(label, json.dumps(results[label]), flush=True)

    # true recall of the approx paths vs exact top-K
    exact_fn = make("exact", jnp.float32)
    ev, ei = exact_fn(u_emb, excl)
    ei = np.asarray(ei)
    for label, dt, recall in (("recall_bf16_r95", jnp.bfloat16, 0.95),
                              ("recall_bf16_r99", jnp.bfloat16, 0.99)):
        av, ai = make("approx", dt, recall)(u_emb, excl)
        ai = np.asarray(ai)
        hits = np.mean([len(set(ei[u]) & set(ai[u])) / K for u in range(N_USERS)])
        results[label] = {"topk_recall_vs_exact": float(hits)}
        print(label, results[label], flush=True)

    with open("parity_runs/prof_retrieval2.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
