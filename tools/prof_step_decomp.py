"""Decompose the sparse-epoch step cost at (1M x 64, B=8192): which op
actually dominates — sort, dedup, gather flavor, scatter, sampling, or loss?
"""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

N, D, STEPS = 1_000_000, 64, 50


def bench(name, make_carry, step_fn, xs, steps=STEPS):
    @jax.jit
    def run(carry, xs):
        def body(c, x):
            return step_fn(c, x), ()
        c, _ = jax.lax.scan(body, carry, xs)
        return c

    def fetch(c):
        jax.tree_util.tree_map(
            lambda x: float(jnp.sum(jnp.ravel(x)[:1]))
            if jnp.issubdtype(x.dtype, jnp.number) else None,
            c,
        )

    c = run(make_carry(), xs)
    fetch(c)
    t0 = time.time()
    c = run(c, xs)
    fetch(c)
    print(f"{name:58s} {(time.time()-t0)/steps*1e6:8.0f} us/step", flush=True)


from beta_recsys_tpu.core.sparse_optim import _segment_dedup

for B in (8192, 32768):
    ids_all = jax.random.randint(jax.random.key(0), (STEPS, B), 0, N)
    r = jax.random.normal(jax.random.key(1), (B, D)) * 0.01

    bench(
        f"B={B:6d} argsort(ids)",
        lambda: jnp.zeros((B,), jnp.int32),
        lambda c, ids: c + jnp.argsort(ids).astype(jnp.int32),
        ids_all, STEPS,
    )
    bench(
        f"B={B:6d} _segment_dedup(ids, rows)",
        lambda: jnp.zeros((B, D)),
        lambda c, ids: c + _segment_dedup(ids, r)[1],
        ids_all, STEPS,
    )
    bench(
        f"B={B:6d} threefry uniform negatives",
        lambda: (jax.random.key(2), jnp.zeros((B,), jnp.int32)),
        lambda c, ids: (jax.random.split(c[0])[0],
                        c[1] + jax.random.randint(c[0], (B,), 0, N, jnp.int32)),
        ids_all, STEPS,
    )

B = 8192
ids_all = jax.random.randint(jax.random.key(0), (STEPS, B), 0, N)
r65 = jax.random.normal(jax.random.key(1), (B, 65)) * 0.01
r195 = jax.random.normal(jax.random.key(1), (B, 195)) * 0.01
r384 = jax.random.normal(jax.random.key(1), (B, 384)) * 0.01

bench(
    "slice-gather (N,195)[ids, :65]",
    lambda: (jax.random.normal(jax.random.key(3), (N, 195)), jnp.zeros((B, 65))),
    lambda c, ids: (c[0], c[1] + c[0][ids, :65]),
    ids_all,
)
bench(
    "full gather (N,195)[ids]",
    lambda: (jax.random.normal(jax.random.key(3), (N, 195)), jnp.zeros((B, 195))),
    lambda c, ids: (c[0], c[1] + c[0][ids]),
    ids_all,
)
bench(
    "aligned slice-gather (N,384)[ids, :128]",
    lambda: (jax.random.normal(jax.random.key(3), (N, 384)), jnp.zeros((B, 128))),
    lambda c, ids: (c[0], c[1] + c[0][ids, :128]),
    ids_all,
)
bench(
    "3-D gather (N,3,128)[ids]",
    lambda: (jax.random.normal(jax.random.key(3), (N, 3, 128)), jnp.zeros((B, 3, 128))),
    lambda c, ids: (c[0], c[1] + c[0][ids]),
    ids_all,
)
bench(
    "scatter-add (B,195) unaligned",
    lambda: jax.random.normal(jax.random.key(4), (N, 195)),
    lambda t, ids: t.at[ids].add(r195),
    ids_all,
)
bench(
    "scatter-add (B,384) aligned",
    lambda: jax.random.normal(jax.random.key(4), (N, 384)),
    lambda t, ids: t.at[ids].add(r384),
    ids_all,
)

# MF row_loss fwd+bwd on gathered rows (no table ops)
from beta_recsys_tpu.models.mf import MF

model = MF({"model": "MF", "emb_dim": D, "loss": "bpr", "lr": 0.01, "reg": 0.0}, N, N)
u_rows = jax.random.normal(jax.random.key(5), (B, D))
i_rows = jax.random.normal(jax.random.key(6), (2 * B, D))


def lossgrad(c, ids):
    rows = {"user_emb": c[0], "item_emb": i_rows,
            "user_bias": jnp.zeros(B), "item_bias": jnp.zeros(2 * B)}
    dense = {"global_bias": c[1]}
    batch = {"users": ids, "pos_items": ids, "neg_items": ids}
    def f(rows, dense):
        return model.row_loss(rows, dense, batch, jax.random.key(0))
    _, (g, gd) = jax.value_and_grad(f, argnums=(0, 1))(rows, dense)
    return (c[0] + g["user_emb"], c[1] + gd["global_bias"])


bench(
    "MF row_loss fwd+bwd (rows only)",
    lambda: (u_rows, jnp.zeros(())),
    lossgrad,
    ids_all,
)
