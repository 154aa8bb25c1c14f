"""Morph the fast micro-bench into the production sparse step until it slows.

Each variant adds one production feature; the first big jump is the culprit.
"""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from beta_recsys_tpu.core.sparse_optim import sparse_adam_row_update

NU, NI, B, D, STEPS = 1_000_000, 100_000, 8192, 64, 100
ku, ki, kr = jax.random.split(jax.random.key(0), 3)
u_all = jax.random.randint(ku, (STEPS, B), 0, NU)
pos_all = jax.random.randint(ki, (STEPS, B), 0, NI)
neg_all = jax.random.randint(kr, (STEPS, B), 0, NI)


def bench(name, step_fn, carries, xs):
    @jax.jit
    def run(carries, xs):
        def body(c, x):
            return step_fn(c, *x), ()
        c, _ = jax.lax.scan(body, carries, xs)
        return c

    c = run(carries, xs)
    jax.block_until_ready(c)
    t0 = time.time()
    c = run(c, xs)
    jax.block_until_ready(c)
    print(f"{name:56s} {(time.time()-t0)/STEPS*1e6:8.0f} us/step", flush=True)


def fresh():
    return dict(
        user_emb=0.01 * jax.random.normal(jax.random.key(1), (NU, D)),
        item_emb=0.01 * jax.random.normal(jax.random.key(2), (NI, D)),
        user_bias=jnp.zeros((NU,)),
        item_bias=jnp.zeros((NI,)),
    )


def moments_for(names, p):
    return {n: (jnp.zeros_like(p[n]), jnp.zeros_like(p[n])) for n in names}


def bpr_loss(rows, u, pos_ids, neg_ids):
    ue = rows["user_emb"]
    ie = rows["item_emb"]
    pos_e, neg_e = ie[:B], ie[B:]
    s_pos = jnp.sum(ue * pos_e, axis=1)
    s_neg = jnp.sum(ue * neg_e, axis=1)
    if "user_bias" in rows:
        s_pos = s_pos + rows["user_bias"] + rows["item_bias"][:B]
        s_neg = s_neg + rows["user_bias"] + rows["item_bias"][B:]
    return jnp.mean(jax.nn.softplus(-(s_pos - s_neg)))


# V1: two 2-D tables, BPR grads, lazy-adam on both (no biases)
def v1(c, u, pos, neg):
    p, mom = c
    ids = {"user_emb": u, "item_emb": jnp.concatenate([pos, neg])}
    rows = {k: p[k][ids[k]] for k in ("user_emb", "item_emb")}
    g = jax.grad(bpr_loss)(rows, u, pos, neg)
    out_p, out_m = dict(p), dict(mom)
    for k in rows:
        m, v = mom[k]
        t2, m2, v2 = sparse_adam_row_update(p[k], m, v, ids[k], g[k], 0.01, 2.0)
        out_p[k], out_m[k] = t2, (m2, v2)
    return out_p, out_m


p = fresh()
p1 = {k: p[k] for k in ("user_emb", "item_emb")}
bench("V1 two 2-D tables (emb only)", v1,
      (p1, moments_for(p1, p1)), (u_all, pos_all, neg_all))


# V2: + 1-D bias tables in loss and updates (the full 4-table production set)
def v2(c, u, pos, neg):
    p, mom = c
    cat = jnp.concatenate([pos, neg])
    ids = {"user_emb": u, "item_emb": cat, "user_bias": u, "item_bias": cat}
    rows = {k: p[k][ids[k]] for k in ids}
    g = jax.grad(bpr_loss)(rows, u, pos, neg)
    out_p, out_m = dict(p), dict(mom)
    for k in rows:
        m, v = mom[k]
        t2, m2, v2 = sparse_adam_row_update(p[k], m, v, ids[k], g[k], 0.01, 2.0)
        out_p[k], out_m[k] = t2, (m2, v2)
    return out_p, out_m


p = fresh()
bench("V2 + 1-D bias tables (4 tables)", v2,
      (p, moments_for(p, p)), (u_all, pos_all, neg_all))


# V3: V1 but updates only the 1-D biases (isolate the bias cost)
def v3(c, u, pos, neg):
    p, mom = c
    cat = jnp.concatenate([pos, neg])
    ids = {"user_bias": u, "item_bias": cat}
    rows = {k: p[k][ids[k]] for k in ids}

    def loss(rows):
        return jnp.mean(jax.nn.softplus(-(rows["user_bias"] + rows["item_bias"][:B]
                                          - rows["item_bias"][B:])))

    g = jax.grad(loss)(rows)
    out_p, out_m = dict(p), dict(mom)
    for k in rows:
        m, v = mom[k]
        t2, m2, v2 = sparse_adam_row_update(p[k], m, v, ids[k], g[k], 0.01, 2.0)
        out_p[k], out_m[k] = t2, (m2, v2)
    return out_p, out_m


p = fresh()
pb = {k: p[k] for k in ("user_bias", "item_bias")}
bench("V3 only 1-D bias tables", v3,
      (pb, moments_for(pb, pb)), (u_all, pos_all, neg_all))
