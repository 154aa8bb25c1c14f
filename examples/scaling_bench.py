"""Data-parallel scaling benchmark: examples/sec vs mesh size + comm model.

On a real multi-chip slice this measures scaling efficiency toward the
v5e-16 >= 80% target (BASELINE.json). With --virtual it runs on N virtual CPU
devices instead — wall-clock is then only structural, but the compiled HLO's
collective bytes ARE the real communication model (identical program on real
chips), so every mesh point also records per-step collective bytes
(parallel/comm_analysis.py) and a predicted v5e ICI comm time. --report
writes the table to SCALING_REPORT.md.

Usage:
    python examples/scaling_bench.py                        # real devices
    python examples/scaling_bench.py --virtual 8 --report   # virtual CPU mesh
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

# v5e ICI: ~45 GB/s per link per direction (2D torus, public "How to Scale
# Your Model" numbers). Used only for the predicted-comm-time column.
ICI_LINK_BYTES_PER_S = 45e9


def comm_model(epoch_fn, example_args, n_devices, num_batches):
    """Per-step collective bytes of the compiled epoch + predicted ICI time.

    The epoch is a lax.scan, so each collective instruction in the HLO runs
    once per step; bytes below are per device per STEP (epoch bytes = x
    num_batches). Pallas ring kernels issue raw remote DMAs that do not
    appear as HLO collectives — strategies using them are annotated instead.
    """
    from beta_recsys_tpu.parallel.comm_analysis import (
        collective_bytes,
        estimate_link_bytes,
    )

    counts = collective_bytes(epoch_fn, *example_args)
    link = estimate_link_bytes(counts, n_devices)
    total_link = sum(link.values())
    return {
        "per_step_collectives": counts,
        "per_step_link_bytes": total_link,
        "per_epoch_link_bytes": total_link * num_batches,
        "predicted_comm_s_per_epoch": total_link * num_batches / ICI_LINK_BYTES_PER_S,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--virtual", type=int, default=0, help="force N virtual CPU devices")
    parser.add_argument("--batch_per_device", type=int, default=2048)
    parser.add_argument("--n_interactions", type=int, default=1_000_000)
    parser.add_argument("--n_users", type=int, default=100_000)
    parser.add_argument("--n_items", type=int, default=50_000)
    parser.add_argument("--emb_dim", type=int, default=64)
    parser.add_argument("--sparse", action="store_true", help="sweep the sharded sparse (lazy-Adam, row-sharded tables) trainer instead")
    parser.add_argument("--report", action="store_true", help="write SCALING_REPORT.md")
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
    rows = []
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
        row = {
            "devices": size,
            "examples_per_sec": round(eps),
            "per_device": round(eps / size),
            "scaling_efficiency": round(eps / (base * size), 3),
        }
        if size > 1:
            num_batches = -(-args.n_interactions // batch)
            row["comm"] = comm_model(
                epoch_fn, (params, opt_state, jax.random.key(1)), size, num_batches
            )
        rows.append(row)
        print(json.dumps(row))
        size *= 2

    if args.report:
        write_report(rows, args)


def write_report(rows, args):
    mode = "sparse (row-sharded lazy-Adam)" if args.sparse else "dense (data-parallel)"
    lines = [
        "# Scaling report — MF {} trainer".format(mode),
        "",
        "Workload: {:,} interactions, {:,} users x {:,} items, d={}, "
        "batch/device={}.".format(
            args.n_interactions, args.n_users, args.n_items,
            args.emb_dim, args.batch_per_device,
        ),
        "",
        "Wall-clock below is {} — on the virtual CPU mesh only the *comm model*"
        " columns are hardware-predictive: they come from the compiled HLO's"
        " collective instructions, which are identical on real chips."
        .format("virtual-CPU structural" if args.virtual else "real-device"),
        "",
        "| devices | examples/s | per-device | efficiency | link bytes/step | "
        "predicted ICI s/epoch | collectives (per step) |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        comm = r.get("comm")
        if comm:
            kinds = "; ".join(
                f"{k}: {v['calls']}x {v['bytes'] / 1e3:.1f}KB"
                for k, v in comm["per_step_collectives"].items()
            )
            lines.append(
                "| {devices} | {examples_per_sec:,} | {per_device:,} | "
                "{scaling_efficiency} | {lb:,} | {ct:.4f} | {kinds} |".format(
                    lb=comm["per_step_link_bytes"],
                    ct=comm["predicted_comm_s_per_epoch"],
                    kinds=kinds or "none",
                    **{k: r[k] for k in
                       ("devices", "examples_per_sec", "per_device", "scaling_efficiency")},
                )
            )
        else:
            lines.append(
                "| {devices} | {examples_per_sec:,} | {per_device:,} | "
                "{scaling_efficiency} | — | — | — |".format(
                    **{k: r[k] for k in
                       ("devices", "examples_per_sec", "per_device", "scaling_efficiency")}
                )
            )
    lines += [
        "",
        "Predicted ICI time assumes a v5e 2D torus at {:.0f} GB/s per link"
        " direction. Scaling efficiency on real hardware ~= compute_time /"
        " (compute_time + predicted ICI time) when collectives do not overlap"
        " compute; XLA overlaps grad all-reduce with the backward pass, so the"
        " prediction is a lower bound. Pallas ring-RDMA paths issue raw remote"
        " DMAs that do not appear as HLO collectives; their wire cost is"
        " (n-1)/n x bucket bytes per link by construction.".format(
            ICI_LINK_BYTES_PER_S / 1e9
        ),
        "",
    ]
    with open("SCALING_REPORT.md", "w") as f:
        f.write("\n".join(lines))
    print("wrote SCALING_REPORT.md")


if __name__ == "__main__":
    main()
