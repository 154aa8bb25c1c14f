"""Trace one sparse epoch; dump op-level cost summary from the profile."""
import glob
import gzip
import time

import jax
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

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
params = model.init_params(jax.random.key(0))
sampler = lambda k, u, shape: uniform_negatives(k, shape, N_ITEMS)
epoch_fn = make_sparse_epoch_fn(model, arrays, B, sampler, lr=0.01, donate=False)
table_names = list(model.row_tables())
state = (init_sparse_state(params, table_names),
         optax.adam(0.01).init({k: v for k, v in params.items() if k not in table_names}))
p, s, k2, loss = epoch_fn(params, state, jax.random.key(1))
jax.block_until_ready(loss)

jax.profiler.start_trace("/tmp/jax_trace")
p, s, k2, loss = epoch_fn(p, s, k2)
jax.block_until_ready(loss)
jax.profiler.stop_trace()

# crude op summary from the trace protobuf events
import json
from collections import defaultdict

paths = glob.glob("/tmp/jax_trace/**/*.trace.json.gz", recursive=True)
print("trace files:", paths)
for path in paths:
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    dur = defaultdict(float)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            name = ev.get("name", "?")
            dur[name] += ev["dur"]
    top = sorted(dur.items(), key=lambda kv: -kv[1])[:40]
    total = sum(dur.values())
    for name, us in top:
        print(f"{us/1e3:10.2f} ms  {name[:110]}")
