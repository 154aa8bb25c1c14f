"""Dump optimized HLO of the real sparse epoch; look for full-table copies in the loop."""
import re
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from beta_recsys_tpu.core import sparse_optim
from beta_recsys_tpu.core.sparse_optim import init_sparse_state, make_sparse_epoch_fn
from beta_recsys_tpu.data.base_data import TrainArrays
from beta_recsys_tpu.models.mf import MF
from beta_recsys_tpu.ops.sampling import uniform_negatives

N_USERS, N_ITEMS, N_INTER, B, D = 1_000_000, 100_000, 2_000_000, 8192, 64
rng = np.random.default_rng(0)
arrays = TrainArrays(
    users=rng.integers(0, N_USERS, N_INTER).astype(np.int32),
    items=rng.integers(0, N_ITEMS, N_INTER).astype(np.int32),
    ratings=np.ones(N_INTER, np.float32),
)
cfg = {"model": "MF", "emb_dim": D, "loss": "bpr", "lr": 0.01,
       "optimizer": "adam", "reg": 0.0, "batch_size": B}
model = MF(cfg, N_USERS, N_ITEMS)
sampler = lambda k, u, shape: uniform_negatives(k, shape, N_ITEMS)
epoch_fn = make_sparse_epoch_fn(model, arrays, B, sampler, 0.01, donate=False)

params = model.init_params(jax.random.key(0))
table_names = list(model.row_tables())
state = (init_sparse_state(params, table_names),
         optax.adam(0.01).init({k: v for k, v in params.items() if k not in table_names}))

lowered = epoch_fn.lower(params, state, jax.random.key(1))
compiled = lowered.compile()
hlo = compiled.as_text()
print(f"total HLO lines: {len(hlo.splitlines())}", file=sys.stderr)

# find ops touching full-table shapes inside the while body
big = re.compile(r"f32\[100[0-9]{4},?\d*\]|f32\[1000000,64\]|f32\[1000000\]|f32\[100000,64\]|f32\[100000\]")
interesting = re.compile(r"\b(copy|scatter|gather|dynamic-update-slice|dynamic-slice|sort|transpose|all-reduce|fusion)\b")
count = {}
for line in hlo.splitlines():
    if big.search(line) and interesting.search(line):
        op = interesting.search(line).group(1)
        # extract output shape
        m = re.match(r"\s*(%?\S+)\s*=\s*(\S+)", line)
        shape = m.group(2) if m else "?"
        key = f"{op} {shape}"
        count[key] = count.get(key, 0) + 1
for k in sorted(count, key=lambda k: -count[k]):
    print(f"{count[k]:4d}  {k}")
print("---- sample copy/sort lines ----")
shown = 0
for line in hlo.splitlines():
    if big.search(line) and re.search(r"\b(copy|sort)\b", line):
        print(line.strip()[:300])
        shown += 1
        if shown > 25:
            break
