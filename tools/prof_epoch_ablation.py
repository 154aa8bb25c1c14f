"""Direct ablation of the unified sparse epoch at (1M x 64, B=8192) on the
real chip: time epoch variants with individual row ops removed, so the cost
decomposition is measured, not modeled (r4 follow-up to the batch sweep's
"row-op-rate-bound" conclusion).

Variants (all same batch formation + loss grad):
  full        — gather + sort/dedup + adam + scatter   (the real step)
  no_scatter  — gather + sort/dedup + adam, result summed into carry
  no_sort     — gather + adam + scatter (no dedup; WRONG semantics, timing only)
  gather_only — gather + loss grad, no update at all
  no_gather   — constant rows + sort/dedup + adam + scatter

Prints us/epoch per variant; differences attribute cost to each op class.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N_USERS, N_ITEMS, D, B, N_INTER = 1_000_000, 100_000, 64, 8192, 2_000_000

from beta_recsys_tpu.core.sparse_optim import _segment_dedup
from beta_recsys_tpu.models.mf import MF
from beta_recsys_tpu.ops.sampling import uniform_negatives


def _rtt():
    f = jax.jit(lambda x: x + 1)
    float(f(jnp.ones(())))
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(f(jnp.ones(())))
        ts.append(time.time() - t0)
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    users = jnp.asarray(rng.integers(0, N_USERS, N_INTER).astype(np.int32))
    items = jnp.asarray(rng.integers(0, N_ITEMS, N_INTER).astype(np.int32))
    model = MF({"model": "MF", "emb_dim": D, "loss": "bpr", "lr": 0.01,
                "reg": 0.0}, N_USERS, N_ITEMS)

    # one unified array for users role only (representative: same op count
    # per row class as the real path, single role keeps the ablation readable)
    total_rows = N_USERS + N_ITEMS
    W = 3 * D  # [param|m|v]
    n_steps = N_INTER // B

    def make_epoch(variant):
        def epoch(uarr, key):
            def step(carry, x):
                uarr, key = carry
                key, k1, k2 = jax.random.split(key, 3)
                s = x * B
                u = jax.lax.dynamic_slice(users, (s,), (B,))
                pos = jax.lax.dynamic_slice(items, (s,), (B,)) + N_USERS
                neg = uniform_negatives(k1, (B,), N_ITEMS) + N_USERS
                ids = jnp.concatenate([u, pos, neg])  # (3B,)
                L = ids.shape[0]

                if variant == "no_gather":
                    rows = jnp.ones((L, W)) * 0.01
                else:
                    rows = uarr[ids]  # (L, 3D) full-row gather

                p = rows[:, :D]
                # toy grad standing in for the loss backward (elementwise)
                g = p * 0.1 + 0.01

                if variant == "gather_only":
                    return (uarr, key), jnp.sum(g[0])

                if variant == "no_sort":
                    ids_s, g_d = ids, g
                    rows_s = rows
                else:
                    order = jnp.argsort(ids)
                    ids_s = ids[order]
                    g_sorted = g[order]
                    first = jnp.concatenate(
                        [jnp.array([True]), ids_s[1:] != ids_s[:-1]])
                    seg = jnp.cumsum(first) - 1
                    summed = jax.ops.segment_sum(g_sorted, seg, num_segments=L)
                    g_d = jnp.where(first[:, None], summed[seg], 0.0)
                    rows_s = rows[order]

                m = rows_s[:, D:2 * D]
                v = rows_s[:, 2 * D:]
                m2 = 0.9 * m + 0.1 * g_d
                v2 = 0.999 * v + 0.001 * g_d ** 2
                delta = -0.01 * m2 / (jnp.sqrt(v2) + 1e-8)
                upd = jnp.concatenate([delta, m2 - m, v2 - v], axis=1)

                if variant == "no_scatter":
                    return (uarr, key), jnp.sum(upd[0])
                uarr2 = uarr.at[ids_s].add(upd)
                return (uarr2, key), jnp.sum(upd[0])

            (uarr, key), outs = jax.lax.scan(
                step, (uarr, key), jnp.arange(n_steps))
            return uarr, key, jnp.sum(outs)

        return jax.jit(epoch, donate_argnums=(0,))

    results = {}
    for variant in ("full", "no_scatter", "no_sort", "gather_only", "no_gather"):
        epoch = make_epoch(variant)
        uarr = jnp.zeros((total_rows, W)) + 0.02
        key = jax.random.key(0)
        uarr, key, out = epoch(uarr, key)  # compile
        float(out)
        rtt = _rtt()
        t0 = time.time()
        for _ in range(3):
            uarr, key, out = epoch(uarr, key)
        float(out)
        dt = max(time.time() - t0 - rtt, 1e-9) / 3
        results[variant] = dt
        print(f"{variant:12s} {dt*1e3:8.1f} ms/epoch "
              f"({N_INTER/dt/1e6:.2f}M ex/s)", flush=True)

    full = results["full"]
    print(f"\nattribution (of {full*1e3:.0f} ms full epoch):")
    print(f"  scatter       ~{(full - results['no_scatter'])*1e3:6.1f} ms")
    print(f"  sort/dedup    ~{(results['full'] - results['no_sort'])*1e3:6.1f} ms")
    print(f"  gather        ~{(full - results['no_gather'])*1e3:6.1f} ms")
    print(f"  base (batch+loss+scan) ~{results['gather_only']*1e3:6.1f} ms incl. gather")


if __name__ == "__main__":
    main()
