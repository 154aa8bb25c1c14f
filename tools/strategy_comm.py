"""Communication model for every sharded-sparse strategy combination.

Wall-clock on the virtual CPU mesh is meaningless, but the compiled HLO's
collective bytes are the real wire model (identical program on real chips).
This sweeps {lookup_strategy} x {grad_exchange} for the sharded sparse
trainer at the production batch shape (B=8192, d=64) on a (data=2, model=4)
virtual mesh — n_model=4 so the bucketed exchange's n_model/capacity_factor
= 2x wire saving is visible — and writes per-step per-device collective
bytes into BENCH_DETAILS.json under "sharded_sparse_comm_model".

Table height doesn't affect collective bytes (only B, d, capacity do), so a
small table keeps the sweep fast while the byte numbers transfer to 1M-row
tables unchanged.

Run: python tools/strategy_comm.py
"""

import json
import sys

sys.path.insert(0, ".")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

    import numpy as np
    import optax

    from beta_recsys_tpu.core.sparse_optim import (
        init_sparse_state,
        make_sharded_sparse_epoch_fn,
        shard_sparse_params,
    )
    from beta_recsys_tpu.data.base_data import TrainArrays
    from beta_recsys_tpu.models.mf import MF
    from beta_recsys_tpu.ops.sampling import uniform_negatives
    from beta_recsys_tpu.parallel.comm_analysis import (
        collective_bytes,
        estimate_link_bytes,
    )
    from beta_recsys_tpu.parallel.mesh import make_mesh

    n_users, n_items, d = 4096, 2048, 64
    batch = 8192
    n_inter = batch  # one step per epoch: per-step bytes == per-epoch bytes
    rng = np.random.default_rng(0)
    arrays = TrainArrays(
        users=rng.integers(0, n_users, n_inter).astype(np.int32),
        items=rng.integers(0, n_items, n_inter).astype(np.int32),
        ratings=np.ones(n_inter, np.float32),
    )
    cfg = {"model": "MF", "emb_dim": d, "loss": "bpr", "lr": 0.01}
    model = MF(cfg, n_users, n_items)
    sampler = lambda key, users, shape: uniform_negatives(key, shape, n_items)
    mesh = make_mesh(n_data=2, n_model=4)
    table_names = list(model.row_tables())

    results = {}
    for lookup in ("psum", "ring"):
        for exchange in ("allgather", "bucketed"):
            fn = make_sharded_sparse_epoch_fn(
                model, arrays, batch, sampler, lr=0.01, mesh=mesh, donate=False,
                lookup_strategy=lookup, grad_exchange=exchange,
            )
            params = shard_sparse_params(
                model.init_params(jax.random.key(0)), table_names, mesh
            )
            state = (
                init_sparse_state(params, table_names),
                optax.adam(0.01).init(
                    {k: v for k, v in params.items() if k not in table_names}
                ),
            )
            counts = collective_bytes(fn, params, state, jax.random.key(1))
            link = estimate_link_bytes(counts, 8)
            key = f"{lookup}+{exchange}"
            results[key] = {
                "per_step_collectives": counts,
                "per_step_link_bytes": sum(link.values()),
            }
            if lookup == "ring":
                # the Pallas ring's remote DMAs are invisible to HLO; its wire
                # cost is (n_model-1)/n_model * bucket bytes per link
                n_model, n_data = 4, 2
                local_b = batch // n_data
                cap = -(-int(-(-local_b // n_model) * 2.0) // 8) * 8  # cf=2.0
                results[key]["ring_dma_link_bytes_per_table"] = int(
                    cap * d * 4 * (n_model - 1) / n_model
                )
            print(key, json.dumps(results[key]))

    try:
        with open("BENCH_DETAILS.json") as f:
            merged = json.load(f)
    except Exception:
        merged = {}
    merged["sharded_sparse_comm_model"] = {
        "mesh": "(data=2, model=4)", "batch": batch, "emb_dim": d,
        "strategies": results,
        "note": "per-device per-step HLO collective bytes; ring remote-DMA "
                "bytes accounted separately (not HLO-visible)",
    }
    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(merged, f, indent=2)
    print("updated BENCH_DETAILS.json: sharded_sparse_comm_model")


if __name__ == "__main__":
    main()
