"""Scatter-add lowering variants at the sparse-epoch shape (r4): the epoch
ablation measured scatter-add as 71% of the unified epoch (495 ms of 698 ms,
tools/prof_epoch_ablation.py). After dedup the kept indices are unique by
construction (duplicates carry zero rows) — can routing duplicates
out-of-bounds + unique_indices=True buy a better XLA lowering?

Variants on (24576, 192) updates into a (1.1M, 192) table, 245 scatters:
  add_plain      — .at[ids].add(upd), duplicate indices present (the default)
  add_uniq       — dupes -> OOB (mode=drop), unique_indices=True
  add_uniq_sortd — same + indices_are_sorted=True (r3 found sorted-hint 5x
                   SLOWER on the plain form; re-check on the unique form)
  set_uniq       — .at[ids].set, dupes -> OOB (the unified_bf16 writeback)
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N, W, L, STEPS = 1_100_000, 192, 24576, 245


def main():
    rng = np.random.default_rng(0)
    # sorted-with-duplicates ids, as the real step produces them
    ids_all = np.sort(rng.integers(0, N, (STEPS, L)), axis=1).astype(np.int32)
    ids_all = jnp.asarray(ids_all)
    upd = jnp.asarray(rng.normal(size=(L, W)).astype(np.float32) * 1e-4)

    def first_mask(ids):
        return jnp.concatenate([jnp.array([True]), ids[1:] != ids[:-1]])

    variants = {
        "add_plain": lambda t, ids: t.at[ids].add(upd),
        "add_uniq": lambda t, ids: t.at[
            jnp.where(first_mask(ids), ids, N)
        ].add(jnp.where(first_mask(ids)[:, None], upd, 0.0), mode="drop",
              unique_indices=True),
        "add_uniq_sorted": lambda t, ids: t.at[
            jnp.where(first_mask(ids), ids, N)
        ].add(jnp.where(first_mask(ids)[:, None], upd, 0.0), mode="drop",
              unique_indices=True, indices_are_sorted=True),
        "set_uniq": lambda t, ids: t.at[
            jnp.where(first_mask(ids), ids, N)
        ].set(upd, mode="drop", unique_indices=True),
    }

    def rtt():
        f = jax.jit(lambda x: x + 1)
        float(f(jnp.ones(())))
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(f(jnp.ones(())))
            ts.append(time.time() - t0)
        return min(ts)

    for name, fn in variants.items():
        @jax.jit
        def run(t, ids_all, fn=fn):
            def body(t, ids):
                return fn(t, ids), ()
            t, _ = jax.lax.scan(body, t, ids_all)
            return t

        t = jnp.zeros((N, W))
        t = run(t, ids_all)
        float(jnp.sum(t[0]))
        r = rtt()
        t0 = time.time()
        t = run(t, ids_all)
        float(jnp.sum(t[0]))
        dt = max(time.time() - t0 - r, 1e-9)
        bytes_moved = STEPS * L * W * 4 * 3  # read+write table rows + operand
        print(f"{name:16s} {dt*1e3/STEPS:7.2f} ms/scatter "
              f"({bytes_moved/dt/1e9:6.1f} GB/s modeled)", flush=True)


if __name__ == "__main__":
    main()
