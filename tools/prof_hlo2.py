"""Locate full-table copies: are they inside the scan while-body?"""
import re
import sys

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
sampler = lambda k, u, shape: uniform_negatives(k, shape, N_ITEMS)
epoch_fn = make_sparse_epoch_fn(model, arrays, B, sampler, 0.01, donate=False)

params = model.init_params(jax.random.key(0))
table_names = list(model.row_tables())
state = (init_sparse_state(params, table_names),
         optax.adam(0.01).init({k: v for k, v in params.items() if k not in table_names}))

hlo = epoch_fn.lower(params, state, jax.random.key(1)).compile().as_text()
with open("/tmp/sparse_epoch.hlo", "w") as f:
    f.write(hlo)

# split into computations
comps = {}
cur = None
for line in hlo.splitlines():
    m = re.match(r"(%?\S+)\s+\([^)]*\)\s*->.*\{$", line) or re.match(r"^(ENTRY\s+\S+|\%\S+|\S+)\s.*\{$", line)
    if line.rstrip().endswith("{") and ("(" in line):
        name = line.split()[0]
        cur = name
        comps[cur] = []
    elif cur is not None:
        comps[cur].append(line)
        if line.strip() == "}":
            cur = None

body = [c for c in comps if "body" in c.lower()]
print("computations matching 'body':", body[:10], file=sys.stderr)
big = re.compile(r"f32\[1000000,64\]|f32\[1000000\]|f32\[100000,64\]|f32\[100000\]")
for name in comps:
    if "body" not in name and "ENTRY" not in name:
        continue
    lines = comps[name]
    hits = [l for l in lines if big.search(l) and re.search(r"copy-start|copy\(|copy-done|slice-start|fusion", l)]
    if hits:
        print(f"==== {name}: {len(hits)} big copy/fusion lines")
        from collections import Counter
        c = Counter()
        for l in hits:
            op = re.search(r"=\s*\(?([a-z0-9\[\],{}:()TSE ]+?)\)?\s*(copy-start|copy-done|copy|slice-start|fusion)", l)
            shape = big.search(l).group(0)
            kind = re.search(r"(copy-start|copy-done|copy\(|slice-start|fusion)", l).group(1)
            c[(kind, shape)] += 1
        for k, v in c.most_common(30):
            print(f"  {v:3d}  {k}")
