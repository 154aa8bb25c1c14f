"""Fit epoch time = overhead + steps * slope for the production sparse epoch.

If the 5.7ms/step headline is really per-step cost, slope ~= 5.7ms; if it is
epoch-level overhead (the 2M-element jax.random.permutation sort, whole-epoch
gathers/negative sampling, non-donated carry copies), the intercept eats it.
"""
import sys
import time

sys.path.insert(0, ".")
import jax
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from beta_recsys_tpu.core.sparse_optim import init_sparse_state, make_sparse_epoch_fn
from beta_recsys_tpu.data.base_data import TrainArrays
from beta_recsys_tpu.models.mf import MF
from beta_recsys_tpu.ops.sampling import uniform_negatives

N_USERS, N_ITEMS, B, D = 1_000_000, 100_000, 8192, 64
rng = np.random.default_rng(0)
cfg = {"model": "MF", "emb_dim": D, "loss": "bpr", "lr": 0.01,
       "optimizer": "adam", "reg": 0.0, "batch_size": B}
model = MF(cfg, N_USERS, N_ITEMS)
sampler = lambda k, u, shape: uniform_negatives(k, shape, N_ITEMS)
table_names = list(model.row_tables())


def epoch_time(n_inter, donate, n_rep=3):
    arrays = TrainArrays(
        users=rng.integers(0, N_USERS, n_inter).astype(np.int32),
        items=rng.integers(0, N_ITEMS, n_inter).astype(np.int32),
        ratings=np.ones(n_inter, np.float32),
    )
    fn = make_sparse_epoch_fn(model, arrays, B, sampler, 0.01, donate=donate)
    params = model.init_params(jax.random.key(0))
    state = (init_sparse_state(params, table_names),
             optax.adam(0.01).init({k: v for k, v in params.items()
                                    if k not in table_names}))
    p, s, k, loss = fn(params, state, jax.random.key(1))
    jax.block_until_ready(loss)
    t0 = time.time()
    for _ in range(n_rep):
        p, s, k, loss = fn(p, s, k)
    jax.block_until_ready(loss)
    return (time.time() - t0) / n_rep


for donate in (False, True):
    t_small = epoch_time(B * 5, donate)     # 5 steps
    t_big = epoch_time(B * 245, donate)     # 245 steps (the bench shape)
    slope = (t_big - t_small) / 240
    intercept = t_small - 5 * slope
    print(f"donate={donate}: 5-step {t_small*1e3:7.1f} ms | 245-step {t_big*1e3:8.1f} ms "
          f"| slope {slope*1e6:7.0f} us/step | epoch overhead {intercept*1e3:7.1f} ms")
