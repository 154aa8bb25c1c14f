"""Data-parallel scaling benchmark: examples/sec vs mesh size.

On a real multi-chip slice this measures scaling efficiency toward the
v5e-16 >= 80% target (BASELINE.json). With --virtual it runs on N virtual CPU
devices instead — numbers are then only structural (correct collectives, no
real bandwidth), useful in CI.

Usage:
    python examples/scaling_bench.py                 # real devices
    python examples/scaling_bench.py --virtual 8     # virtual CPU mesh
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--virtual", type=int, default=0, help="force N virtual CPU devices")
    parser.add_argument("--batch_per_device", type=int, default=2048)
    parser.add_argument("--n_interactions", type=int, default=1_000_000)
    parser.add_argument("--n_users", type=int, default=100_000)
    parser.add_argument("--n_items", type=int, default=50_000)
    parser.add_argument("--emb_dim", type=int, default=64)
    parser.add_argument("--sparse", action="store_true", help="sweep the sharded sparse (lazy-Adam, row-sharded tables) trainer instead")
    args = parser.parse_args()

    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.virtual)

    import numpy as np

    from beta_recsys_tpu.core.train_engine import make_epoch_fn, make_optimizer
    from beta_recsys_tpu.data.base_data import TrainArrays
    from beta_recsys_tpu.models.mf import MF
    from beta_recsys_tpu.ops.sampling import uniform_negatives
    from beta_recsys_tpu.parallel.mesh import make_mesh

    n_devices = len(jax.devices())
    rng = np.random.default_rng(0)
    arrays = TrainArrays(
        users=rng.integers(0, args.n_users, args.n_interactions).astype(np.int32),
        items=rng.integers(0, args.n_items, args.n_interactions).astype(np.int32),
        ratings=np.ones(args.n_interactions, np.float32),
    )
    cfg = {"model": "MF", "emb_dim": args.emb_dim, "loss": "bpr", "optimizer": "adam", "lr": 0.01}
    model = MF(cfg, args.n_users, args.n_items)
    optimizer = make_optimizer(cfg)
    sampler = lambda key, users, shape: uniform_negatives(key, shape, args.n_items)

    results = {}
    size = 1
    while size <= n_devices:
        batch = args.batch_per_device * size
        if args.sparse:
            # Sharded sparse: row-sharded tables + moments. Use a 2-way model
            # axis once there are >= 4 devices, else pure data-parallel.
            import optax

            from beta_recsys_tpu.core.sparse_optim import (
                init_sparse_state,
                make_sharded_sparse_epoch_fn,
                make_sparse_epoch_fn,
                shard_sparse_params,
            )

            table_names = list(model.row_tables())
            if size > 1:
                n_model = 2 if size >= 4 else 1
                mesh = make_mesh(n_data=size // n_model, n_model=n_model)
                epoch_fn = make_sharded_sparse_epoch_fn(
                    model, arrays, batch, sampler, lr=0.01, mesh=mesh, donate=False
                )
                params = shard_sparse_params(
                    model.init_params(jax.random.key(0)), table_names, mesh
                )
            else:
                epoch_fn = make_sparse_epoch_fn(
                    model, arrays, batch, sampler, lr=0.01, donate=False
                )
                params = model.init_params(jax.random.key(0))
            opt_state = (
                init_sparse_state(params, table_names),
                optax.adam(0.01).init(
                    {k: v for k, v in params.items() if k not in table_names}
                ),
            )
        else:
            mesh = make_mesh(n_data=size, n_model=1) if size > 1 else None
            epoch_fn = make_epoch_fn(
                model, optimizer, arrays, batch, sampler, donate=False, mesh=mesh
            )
            params = model.init_params(jax.random.key(0))
            opt_state = optimizer.init(params)
        p, o, k, loss = epoch_fn(params, opt_state, jax.random.key(1))
        float(loss)  # value fetch: block_until_ready does not block on axon
        t0 = time.time()
        for _ in range(3):
            p, o, k, loss = epoch_fn(p, o, k)
        float(loss)
        dt = (time.time() - t0) / 3
        eps = args.n_interactions / dt
        results[size] = eps
        base = results[1]
        print(
            json.dumps(
                {
                    "devices": size,
                    "examples_per_sec": round(eps),
                    "per_device": round(eps / size),
                    "scaling_efficiency": round(eps / (base * size), 3),
                }
            )
        )
        size *= 2


if __name__ == "__main__":
    main()
