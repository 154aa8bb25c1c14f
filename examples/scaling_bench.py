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
    parser.add_argument("--model", default="MF", choices=["MF", "NCF", "LightGCN", "SASRec"],
                        help="dense data-parallel sweeps cover all four north-star models (--sparse implies MF)")
    parser.add_argument("--report", action="store_true", help="write SCALING_REPORT.md")
    args = parser.parse_args()

    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.virtual)

    import numpy as np

    from beta_recsys_tpu.core.train_engine import (
        make_epoch_fn,
        make_optimizer,
        make_sequence_epoch_fn,
    )
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
    model_name = "MF" if args.sparse else args.model
    sampler = lambda key, users, shape: uniform_negatives(key, shape, args.n_items)

    seq_arrays = None
    if model_name == "MF":
        cfg = {"model": "MF", "emb_dim": args.emb_dim, "loss": "bpr", "optimizer": "adam", "lr": 0.01}
        model = MF(cfg, args.n_users, args.n_items)
    elif model_name == "NCF":
        from beta_recsys_tpu.models.ncf import NeuMF

        cfg = {"model": "NCF", "emb_dim": args.emb_dim // 4 or 8,
               "mlp_config": {"n_layers": 3}, "num_negative": 4,
               "optimizer": "adam", "lr": 0.001}
        model = NeuMF(cfg, args.n_users, args.n_items)
    elif model_name == "LightGCN":
        import pandas as pd

        from beta_recsys_tpu.data.base_data import BaseData
        from beta_recsys_tpu.models.lightgcn import LightGCN
        from beta_recsys_tpu.utils.constants import (
            DEFAULT_ITEM_COL, DEFAULT_RATING_COL, DEFAULT_TIMESTAMP_COL,
            DEFAULT_USER_COL,
        )

        df = pd.DataFrame({
            DEFAULT_USER_COL: np.asarray(arrays.users),
            DEFAULT_ITEM_COL: np.asarray(arrays.items),
            DEFAULT_RATING_COL: np.ones(args.n_interactions, np.float32),
            DEFAULT_TIMESTAMP_COL: np.arange(args.n_interactions),
        })
        gdata = BaseData((df, [], []), intersect=False)
        cfg = {"model": "LightGCN", "emb_dim": args.emb_dim,
               "layer_size": [64, 64, 64], "regs": [1e-5], "keep_pro": 1.0,
               "optimizer": "adam", "lr": 0.001}
        model = LightGCN(cfg, gdata.n_users, gdata.n_items,
                         artifacts={"adj": gdata.get_norm_adj("sym")})
        arrays = gdata.train_arrays()
        sampler = lambda key, users, shape: uniform_negatives(key, shape, gdata.n_items)
    elif model_name == "SASRec":
        import pandas as pd

        from beta_recsys_tpu.data.sequential_data import SequentialData
        from beta_recsys_tpu.models.sasrec import SASRec
        from beta_recsys_tpu.utils.constants import (
            DEFAULT_ITEM_COL, DEFAULT_RATING_COL, DEFAULT_TIMESTAMP_COL,
            DEFAULT_USER_COL,
        )

        per_user = max(args.n_interactions // args.n_users, 3)
        n_seq_users = args.n_interactions // per_user
        df = pd.DataFrame({
            DEFAULT_USER_COL: np.repeat(np.arange(n_seq_users), per_user),
            DEFAULT_ITEM_COL: rng.integers(0, args.n_items, n_seq_users * per_user),
            DEFAULT_RATING_COL: np.ones(n_seq_users * per_user, np.float32),
            DEFAULT_TIMESTAMP_COL: np.tile(np.arange(per_user), n_seq_users),
        })
        sdata = SequentialData((df, [], []), intersect=False)
        maxlen = 50
        cfg = {"model": "SASRec", "emb_dim": args.emb_dim, "maxlen": maxlen,
               "num_blocks": 2, "num_heads": 2, "dropout_rate": 0.0,
               "l2_emb": 0.0, "optimizer": "adam", "lr": 0.001}
        model = SASRec(cfg, sdata.n_users, sdata.n_items)
        seq_arrays = sdata.train_seq_arrays(maxlen)
        from beta_recsys_tpu.core.train_engine import make_negative_sampler

        sampler = make_negative_sampler(sdata, "bitmask")
    optimizer = make_optimizer(cfg)

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
            if model_name == "SASRec":
                epoch_fn = make_sequence_epoch_fn(
                    model, optimizer, seq_arrays, batch, sampler,
                    donate=False, mesh=mesh,
                )
            else:
                epoch_fn = make_epoch_fn(
                    model, optimizer, arrays, batch, sampler, donate=False,
                    mesh=mesh,
                    num_neg=int(cfg.get("num_negative", 1)),
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
        n_examples = (len(seq_arrays["users"]) if model_name == "SASRec"
                      else args.n_interactions)
        eps = n_examples / dt
        results[size] = eps
        base = results[1]
        row = {
            "devices": size,
            "examples_per_sec": round(eps),
            "per_device": round(eps / size),
            "scaling_efficiency": round(eps / (base * size), 3),
        }
        if size > 1:
            n_examples = (len(seq_arrays["users"]) if model_name == "SASRec"
                          else args.n_interactions)
            num_batches = -(-n_examples // batch)
            row["comm"] = comm_model(
                epoch_fn, (params, opt_state, jax.random.key(1)), size, num_batches
            )
        rows.append(row)
        print(json.dumps(row))
        size *= 2

    if args.report:
        write_report(rows, args)


def write_report(rows, args):
    model_name = "MF" if args.sparse else args.model
    mode = "sparse (row-sharded lazy-Adam)" if args.sparse else "dense (data-parallel)"
    section_key = "## {} — {} trainer".format(model_name, mode)
    lines = [
        section_key,
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
    # merge: replace this model/mode's section in SCALING_REPORT.md, keep others
    import os
    import re

    header = ("# Scaling report — comm-model scaling across the north-star "
              "models\n\nEach section: examples/s vs mesh size plus the "
              "compiled HLO's per-step collective bytes (hardware-predictive "
              "even on the virtual CPU mesh).\n")
    existing = ""
    if os.path.exists("SCALING_REPORT.md"):
        with open("SCALING_REPORT.md") as f:
            existing = f.read()
    sections = re.split(r"\n(?=## )", existing)
    sections = [sec for sec in sections
                if sec.startswith("## ") and not sec.startswith(section_key)]
    sections.append("\n".join(lines).rstrip() + "\n")
    with open("SCALING_REPORT.md", "w") as f:
        f.write(header + "\n" + "\n".join(sections))
    print("wrote SCALING_REPORT.md section: " + section_key)


if __name__ == "__main__":
    main()
