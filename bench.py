"""Benchmark: MF BPR training throughput (examples/sec/chip) on ml-100k-shaped data.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference trains MF on ml-100k at ~13.0 s/epoch on an unrecorded
GPU (examples/MF_API_test.ipynb, BASELINE.md) — with ~99k BPR pairs per epoch
that is ~7.6k examples/s. vs_baseline = our examples/s / 7600.
"""

import json
import time

import numpy as np

REFERENCE_EXAMPLES_PER_SEC = 99_000 / 13.0  # ≈7.6k; reference MF ml-100k epoch


def main():
    import jax

    from beta_recsys_tpu.core.train_engine import make_epoch_fn, make_negative_sampler, make_optimizer
    from beta_recsys_tpu.data.base_data import BaseData
    from beta_recsys_tpu.datasets.data_split import generate_random_data, leave_one_out
    from beta_recsys_tpu.models.mf import MF
    from beta_recsys_tpu.utils.constants import DEFAULT_FLAG_COL
    import pandas as pd

    # ml-100k shape: 943 users x 1682 items x 100k interactions.
    rng = np.random.default_rng(0)
    n_users, n_items, n_inter = 943, 1682, 100_000
    from beta_recsys_tpu.utils.constants import (
        DEFAULT_ITEM_COL,
        DEFAULT_RATING_COL,
        DEFAULT_TIMESTAMP_COL,
        DEFAULT_USER_COL,
    )

    df = pd.DataFrame(
        {
            DEFAULT_USER_COL: rng.integers(0, n_users, n_inter),
            DEFAULT_ITEM_COL: rng.integers(0, n_items, n_inter),
            DEFAULT_RATING_COL: np.ones(n_inter, dtype=np.float32),
            DEFAULT_TIMESTAMP_COL: np.arange(n_inter),
        }
    )
    flagged = leave_one_out(df)
    train = flagged[flagged[DEFAULT_FLAG_COL] == "train"].copy()
    data = BaseData((train, [], []), intersect=False)

    model_cfg = {
        "model": "MF",
        "emb_dim": 64,
        "batch_size": 400,  # reference configs/mf_default.json batch_size
        "loss": "bpr",
        "optimizer": "adam",
        "lr": 0.05,
        "reg": 0.0,
    }
    model = MF(model_cfg, data.n_users, data.n_items)
    params = model.init_params(jax.random.key(0))
    optimizer = make_optimizer(model_cfg)
    opt_state = optimizer.init(params)
    neg_sampler = make_negative_sampler(data, "bitmask")
    epoch_fn = make_epoch_fn(
        model, optimizer, data.train_arrays(), model_cfg["batch_size"],
        neg_sampler=neg_sampler, donate=False,
    )

    rng_key = jax.random.key(42)
    n_train = len(train)

    # Warmup (compile)
    p, o, rng_key, loss = epoch_fn(params, opt_state, rng_key)
    jax.block_until_ready(loss)

    n_epochs = 5
    t0 = time.time()
    for _ in range(n_epochs):
        p, o, rng_key, loss = epoch_fn(p, o, rng_key)
    jax.block_until_ready(loss)
    dt = time.time() - t0

    examples_per_sec = n_train * n_epochs / dt
    print(
        json.dumps(
            {
                "metric": "mf_ml100k_train_examples_per_sec_per_chip",
                "value": round(examples_per_sec, 1),
                "unit": "examples/s",
                "vs_baseline": round(examples_per_sec / REFERENCE_EXAMPLES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
