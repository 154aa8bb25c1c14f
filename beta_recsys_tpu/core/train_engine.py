"""Training engine: run lifecycle + whole-epoch jitted training loops.

TPU-first redesign of the reference TrainEngine (beta_rec/core/train_engine.py:23-349):
- The per-batch Python loop (models/torch_engine.py:47-68) becomes ONE jitted
  ``lax.scan`` over all batches of an epoch — data arrays live on device, the
  epoch permutation, negative sampling, gradient and optimizer update all run
  inside a single compiled program. On a small model like MF this turns the
  reference's ~13 s epochs into milliseconds.
- Negative sampling (host multiprocess / pandas in the reference) is an
  on-device kernel (beta_recsys_tpu.ops.sampling) keyed by the train step RNG.
- Early stop + checkpoint-on-improvement semantics match the reference
  (core/train_engine.py:200-240) but run synchronously (no eval threads).
"""

import os
import random as _py_random
import string
import time
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..ops.sampling import (
    make_membership_test,
    sample_negatives_rejection,
    sample_negatives_rejection_bitmask,
    uniform_negatives,
)
from ..utils.common import ensure_dir, set_seed
from ..utils.constants import MAX_N_UPDATE
from .checkpoint import load_checkpoint, save_checkpoint, save_metadata
from .eval_engine import EvalBookkeeper, RankingEvaluator, test_eval

# Dense positive bitmasks are used for rejection sampling up to this many cells.
_BITMASK_CELL_LIMIT = 64 * 1024 * 1024

# Above this many bytes of embedding-row tables, a multi-device mesh build
# auto-routes to the row-sharded sparse trainer: the dense data-parallel path
# all-reduces the full table gradient each step (2 x bytes / 45 GB/s of ICI),
# which alone breaks the >=80% scaling-efficiency target once tables pass
# ~8 MB (SCALING_REPORT.md "predicted v5e-16 efficiency").
AUTO_SPARSE_TABLE_BYTES = 8 * 1024 * 1024


def make_optimizer(model_cfg):
    """Optimizer factory: sgd / adam / rmsprop (reference torch_engine.py:23-39)."""
    name = model_cfg.get("optimizer", "adam")
    lr = float(model_cfg.get("lr", 1e-3))
    if name == "sgd":
        return optax.sgd(lr)
    if name == "adam":
        return optax.adam(lr)
    if name == "rmsprop":
        return optax.rmsprop(lr)
    raise ValueError(f"Unknown optimizer {name}")


def make_negative_sampler(data, mode="auto"):
    """Return fn(rng, users, shape) -> negative item ids, jit-compatible.

    mode: 'uniform' (no rejection), 'bitmask', 'csr', or 'auto' (bitmask for
    small catalogs, csr binary-search otherwise).
    """
    n_items = data.n_items
    if mode == "uniform":
        return lambda rng, users, shape: uniform_negatives(rng, shape, n_items)
    if mode == "auto":
        mode = "bitmask" if data.n_users * data.n_items <= _BITMASK_CELL_LIMIT else "csr"
    if mode == "bitmask":
        pos_mask = jnp.asarray(data.pos_bitmask())
        return lambda rng, users, shape: sample_negatives_rejection_bitmask(
            rng, users, shape, n_items, pos_mask
        )
    if mode == "csr":
        indptr, items_sorted = data.pos_csr()
        is_positive = make_membership_test(indptr, items_sorted)
        return lambda rng, users, shape: sample_negatives_rejection(
            rng, users, shape, n_items, is_positive
        )
    raise ValueError(f"Unknown negative sampler mode {mode}")


def _check_nonempty(n, what):
    if n == 0:
        raise ValueError(f"empty training set for {what} — check filters/splits")


def _loss_with_dtype(model, compute_dtype):
    """Mixed-precision hook shared by every epoch builder.

    With ``compute_dtype`` (typically ``bfloat16``, the TPU MXU's native
    input type) the float leaves of the params pytree are cast down INSIDE
    the differentiated function, so the forward/backward runs in low
    precision while the master params, the gradients (astype's VJP casts the
    cotangent back up), and the optimizer moments all stay float32 — the
    standard TPU mixed-precision recipe. ``None`` leaves the loss untouched.
    """
    if compute_dtype is None:
        return model.loss
    dt = jnp.dtype(compute_dtype)

    def loss_fn(params, batch, rng):
        cast = jax.tree_util.tree_map(
            lambda x: x.astype(dt)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            params,
        )
        return model.loss(cast, batch, rng).astype(jnp.float32)

    return loss_fn


def _padded_order(perm, padded_size):
    """Extend a permutation to ``padded_size`` by wrapping (static shapes)."""
    n = perm.shape[0]
    if padded_size == n:
        return perm
    reps = -(-padded_size // n)  # ceil
    return jnp.concatenate([perm] * reps)[:padded_size]



def _mesh_round_batch(batch_size, mesh):
    """Round a (clamped) batch size down to a multiple of the data-axis size
    so batch shards are even (shard_map requires exact divisibility)."""
    if mesh is None:
        return batch_size
    n_data = mesh.shape["data"]
    return max(batch_size // n_data, 1) * n_data


def make_epoch_fn(model, optimizer, train_arrays, batch_size, neg_sampler=None, num_neg=1, donate=True, mesh=None, compute_dtype=None):
    """Build a jitted whole-epoch trainer: (params, opt_state, rng) -> updated + mean loss.

    Batches for the model's ``batch_kind`` — pairwise (BPR triplets with
    on-device negatives), pointwise (positives + ``num_neg`` sampled negatives
    with 0 labels, reference data/base_data.py:182-216), or multineg — are
    formed ONCE per epoch (permutation gather + negative draw + per-step rng
    keys) and fed to the scan as xs. Forming them inside the scan body costs
    100s of µs/step on TPU: narrow (element-wide) gathers and per-step threefry
    serialize, and scatter/update operands derived from in-loop gathers bounce
    through scratch memory. With xs batches the step body is pure compute
    (~35 µs/step for MF at B=8192 on one chip).

    With ``mesh`` the per-step batch is constrained to shard over the "data"
    axis, so XLA partitions the whole epoch data-parallel (grad all-reduce
    inserted automatically); batch_size must divide by the data-axis size.
    """
    users = jnp.asarray(train_arrays.users)
    items = jnp.asarray(train_arrays.items)
    ratings = jnp.asarray(train_arrays.ratings)
    n = users.shape[0]
    _check_nonempty(n, "interaction batches")
    batch_size = _mesh_round_batch(min(batch_size, n), mesh)
    num_batches = -(-n // batch_size)
    padded_size = num_batches * batch_size
    kind = model.batch_kind

    loss_fn = _loss_with_dtype(model, compute_dtype)
    grad_fn = _make_grad_fn(
        loss_fn, mesh, prepare=_pointwise_prepare if kind == "pointwise" else None
    )

    def epoch_fn(params, opt_state, rng):
        rng, perm_key, k_neg, k_epoch = jax.random.split(rng, 4)
        order = _padded_order(jax.random.permutation(perm_key, n), padded_size)
        u_all = users[order]
        it_all = items[order]
        step_keys = jax.random.split(k_epoch, num_batches)
        if kind == "pairwise":
            neg_all = neg_sampler(k_neg, u_all, (padded_size,))
            xs = (
                u_all.reshape(num_batches, batch_size),
                it_all.reshape(num_batches, batch_size),
                neg_all.reshape(num_batches, batch_size),
                None,
                step_keys,
            )
        elif kind == "pointwise":
            r_all = ratings[order]
            u_rep_all = jnp.broadcast_to(
                u_all[:, None], (padded_size, num_neg)
            ).reshape(-1)
            neg_all = neg_sampler(k_neg, u_rep_all, (padded_size * num_neg,))
            xs = (
                u_all.reshape(num_batches, batch_size),
                it_all.reshape(num_batches, batch_size),
                neg_all.reshape(num_batches, batch_size * num_neg),
                r_all.reshape(num_batches, batch_size),
                step_keys,
            )
        elif kind == "multineg":
            neg_all = neg_sampler(k_neg, u_all[:, None], (padded_size, num_neg))
            xs = (
                u_all.reshape(num_batches, batch_size),
                it_all.reshape(num_batches, batch_size),
                neg_all.reshape(num_batches, batch_size, num_neg),
                None,
                step_keys,
            )
        else:
            raise ValueError(
                f"make_epoch_fn handles pairwise/pointwise/multineg; got {kind} — "
                "use the model family's dedicated epoch builder"
            )

        def step(carry, x):
            params, opt_state = carry
            u, it, neg, r, k_loss = x
            if kind == "pairwise" or kind == "multineg":
                batch = {"users": u, "pos_items": it, "neg_items": neg}
            else:  # pointwise — raw fields; the concat happens inside grad_fn
                # (per data shard): concatenating data-sharded arrays OUTSIDE
                # the shard_map interleaves shards and costs resharding
                # all-gathers; the loss is row-order-invariant, so local
                # concat + pmean is exact.
                batch = {"u": u, "it": it, "neg": neg, "r": r}
            loss, grads = grad_fn(params, batch, k_loss)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            post = getattr(model, "post_update", None)
            if post is not None:
                params = post(params)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(step, (params, opt_state), xs)
        return params, opt_state, rng, jnp.mean(losses)

    return jax.jit(epoch_fn, donate_argnums=(0, 1) if donate else ())



def _mesh_shard_batch(batch, mesh):
    """Constrain every batch array's leading dim to shard over "data"."""
    if mesh is None:
        return batch
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    return {k: jax.lax.with_sharding_constraint(v, sharding) for k, v in batch.items()}


def _pointwise_prepare(b):
    """Expand raw pointwise fields into the model's (users, items, labels)
    batch. Runs per data shard inside the grad fn — shard-local concat order
    differs from the global concat, but the loss is row-order-invariant."""
    u, it, neg, r = b["u"], b["it"], b["neg"], b["r"]
    nn = neg.shape[0] // u.shape[0]
    u_rep = jnp.broadcast_to(u[:, None], (u.shape[0], nn)).reshape(-1)
    return {
        "users": jnp.concatenate([u, u_rep]),
        "items": jnp.concatenate([it, neg]),
        "labels": jnp.concatenate([r, jnp.zeros_like(neg, dtype=r.dtype)]),
    }


def _make_grad_fn(loss_fn, mesh, prepare=None):
    """(params, batch, key) -> (loss, grads), with explicit SPMD on a mesh.

    Letting XLA's partitioner place the gradient all-reduce moves ~4x the
    necessary bytes for embedding models: the lookup backward produces several
    full-shape partial gradients per table and the partitioner all-reduces
    each partial instead of summing first (measured on ml-100k MF: 2.73 MB vs
    682 KB of table grads per step; tools/predict_efficiency.py). On a pure
    data-parallel mesh the gradient is computed inside shard_map, where the
    partials sum locally and each tensor crosses the ICI exactly once via
    pmean — the scaling-book recipe of explicit collectives on the hot path.

    Meshes with a >1 "model" axis (row-sharded dense params) keep the
    partitioner path: their table shards never cross the ICI at all.
    """
    if mesh is None or mesh.shape["model"] > 1:

        def grad_fn(params, batch, key):
            if prepare is not None:
                batch = prepare(batch)
            batch = _mesh_shard_batch(batch, mesh)
            return jax.value_and_grad(loss_fn)(params, batch, key)

        return grad_fn

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def local_grad(params, batch, key):
        if prepare is not None:
            batch = prepare(batch)
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        return jax.lax.pmean((loss, grads), "data")

    return shard_map(
        local_grad,
        mesh=mesh,
        in_specs=(P(), P("data"), P()),
        out_specs=(P(), P()),
        check_vma=False,  # outputs are replicated by construction (pmean)
    )

def make_sequence_epoch_fn(model, optimizer, seq_arrays, batch_size, neg_sampler, donate=True, mesh=None, compute_dtype=None):
    """Whole-epoch jitted trainer for sequence models (SASRec family).

    ``seq_arrays`` from SequentialData.train_seq_arrays: users (n,), seq/pos
    (n, maxlen). Each step samples ``batch_size`` users uniformly with
    replacement (reference semantics: num_batch = n_users // batch_size draws
    per epoch, recommenders/sasrec.py:46-50) and draws per-position negatives
    on device, rejected against the user's positives.
    """
    users = jnp.asarray(seq_arrays["users"])
    seq = jnp.asarray(seq_arrays["seq"])
    pos = jnp.asarray(seq_arrays["pos"])
    n = users.shape[0]
    _check_nonempty(n, "sequence batches (users need >= 2 interactions)")
    batch_size = _mesh_round_batch(min(batch_size, n), mesh)
    num_batches = max(n // batch_size, 1)
    maxlen = seq.shape[1]

    loss_fn = _loss_with_dtype(model, compute_dtype)
    grad_fn = _make_grad_fn(loss_fn, mesh)

    def epoch_fn(params, opt_state, rng):
        # Row draw + user gather + negative draw hoisted out of the scan (see
        # make_epoch_fn); the wide (B, maxlen) seq/pos row gathers stay in-loop
        # — row gathers pipeline well, and hoisting them would materialize the
        # whole epoch's sequences.
        rng, k_row, k_neg, k_epoch = jax.random.split(rng, 4)
        rows_all = jax.random.randint(k_row, (num_batches, batch_size), 0, n)
        u_all = users[rows_all]
        neg0_all = neg_sampler(k_neg, u_all[..., None], (num_batches, batch_size, maxlen))
        xs = (rows_all, u_all, neg0_all, jax.random.split(k_epoch, num_batches))

        def step(carry, x):
            params, opt_state = carry
            rows, u, neg0, k_loss = x
            s = seq[rows]
            p = pos[rows]
            # Negatives: 0-indexed draw rejected vs user positives, then +1
            # into the 1-indexed item space; pad positions masked in the loss.
            neg = jnp.where(p != 0, neg0 + 1, 0)
            batch = {"users": u, "seq": s, "pos": p, "neg": neg}
            loss, grads = grad_fn(params, batch, k_loss)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(step, (params, opt_state), xs)
        return params, opt_state, rng, jnp.mean(losses)

    return jax.jit(epoch_fn, donate_argnums=(0, 1) if donate else ())


def make_prefix_epoch_fn(model, optimizer, arrays, batch_size, donate=True, mesh=None, compute_dtype=None):
    """Whole-epoch trainer over (prefix, target) session examples (NARM family)."""
    seq = jnp.asarray(arrays["seq"])
    target = jnp.asarray(arrays["target"])
    n = seq.shape[0]
    _check_nonempty(n, "prefix/target examples")
    batch_size = _mesh_round_batch(min(batch_size, n), mesh)
    num_batches = -(-n // batch_size)
    padded_size = num_batches * batch_size

    loss_fn = _loss_with_dtype(model, compute_dtype)
    grad_fn = _make_grad_fn(loss_fn, mesh)

    def epoch_fn(params, opt_state, rng):
        rng, perm_key, k_epoch = jax.random.split(rng, 3)
        order = _padded_order(jax.random.permutation(perm_key, n), padded_size)
        order = order.reshape(num_batches, batch_size)
        # target is a narrow gather — hoist it; seq rows stay in-loop.
        xs = (order, target[order], jax.random.split(k_epoch, num_batches))

        def step(carry, x):
            params, opt_state = carry
            batch_order, tgt, k_loss = x
            batch = {"seq": seq[batch_order], "target": tgt}
            loss, grads = grad_fn(params, batch, k_loss)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(step, (params, opt_state), xs)
        return params, opt_state, rng, jnp.mean(losses)

    return jax.jit(epoch_fn, donate_argnums=(0, 1) if donate else ())


def make_sequence_time_epoch_fn(model, optimizer, seq_arrays, batch_size, neg_sampler, donate=True, mesh=None, compute_dtype=None):
    """Sequence trainer with per-user time-interval matrices (TiSASRec)."""
    users = jnp.asarray(seq_arrays["users"])
    seq = jnp.asarray(seq_arrays["seq"])
    pos = jnp.asarray(seq_arrays["pos"])
    time_matrix = jnp.asarray(seq_arrays["time_matrix"])
    n = users.shape[0]
    _check_nonempty(n, "sequence batches (users need >= 2 interactions)")
    batch_size = _mesh_round_batch(min(batch_size, n), mesh)
    num_batches = max(n // batch_size, 1)
    maxlen = seq.shape[1]

    loss_fn = _loss_with_dtype(model, compute_dtype)
    grad_fn = _make_grad_fn(loss_fn, mesh)

    def epoch_fn(params, opt_state, rng):
        rng, k_row, k_neg, k_epoch = jax.random.split(rng, 4)
        rows_all = jax.random.randint(k_row, (num_batches, batch_size), 0, n)
        u_all = users[rows_all]
        neg0_all = neg_sampler(k_neg, u_all[..., None], (num_batches, batch_size, maxlen))
        xs = (rows_all, u_all, neg0_all, jax.random.split(k_epoch, num_batches))

        def step(carry, x):
            params, opt_state = carry
            rows, u, neg0, k_loss = x
            p = pos[rows]
            neg = jnp.where(p != 0, neg0 + 1, 0)
            batch = {
                "users": u,
                "seq": seq[rows],
                "pos": p,
                "neg": neg,
                "time_matrix": time_matrix[rows],
            }
            loss, grads = grad_fn(params, batch, k_loss)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), xs
        )
        return params, opt_state, rng, jnp.mean(losses)

    return jax.jit(epoch_fn, donate_argnums=(0, 1) if donate else ())


def make_userrow_epoch_fn(model, optimizer, user_rows, batch_size, donate=True, mesh=None, compute_dtype=None):
    """Whole-epoch trainer over dense user rows (VAE family).

    ``user_rows``: (n_users, n_items) float matrix (binarized interactions);
    each step takes a permuted slice of user rows (reference VAECF epoch loop,
    beta_rec/models/vaecf.py:144-167).
    """
    rows_mat = jnp.asarray(user_rows)
    n = rows_mat.shape[0]
    _check_nonempty(n, "user rows")
    batch_size = _mesh_round_batch(min(batch_size, n), mesh)
    num_batches = -(-n // batch_size)
    padded_size = num_batches * batch_size

    loss_fn = _loss_with_dtype(model, compute_dtype)
    grad_fn = _make_grad_fn(loss_fn, mesh)

    def epoch_fn(params, opt_state, rng):
        rng, perm_key, k_epoch = jax.random.split(rng, 3)
        order = _padded_order(jax.random.permutation(perm_key, n), padded_size)
        order = order.reshape(num_batches, batch_size)
        xs = (order, jax.random.split(k_epoch, num_batches))

        def step(carry, x):
            params, opt_state = carry
            batch_order, k_loss = x
            batch = {"rows": rows_mat[batch_order], "users": batch_order}
            loss, grads = grad_fn(params, batch, k_loss)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(step, (params, opt_state), xs)
        return params, opt_state, rng, jnp.mean(losses)

    return jax.jit(epoch_fn, donate_argnums=(0, 1) if donate else ())


def make_triple_epoch_fn(model, optimizer, triples, batch_size, n_users, n_items, n_neg, donate=True, mesh=None, compute_dtype=None, user_alias=None, item_alias=None):
    """Whole-epoch trainer over (user, item_i, item_j[, t]) basket triples.

    ``user_alias``/``item_alias`` — (prob_arr, alias_arr) pairs — draw
    popularity-weighted negatives on device (ops.sampling.alias_negatives),
    matching the reference's per-batch AliasTable draws
    (models/triple2vec.py:124-170); without them negatives are uniform.
    Measured r5 (structured split): item-weighted negatives lift Triple2vec
    ndcg@10 0.2322 -> 0.2592 (reference parity); weighting users AND items
    together collapses training (0.046) — TrainEngine weights items only by
    default.
    """
    users = jnp.asarray(triples["users"])
    item1 = jnp.asarray(triples["item1"])
    item2 = jnp.asarray(triples["item2"])
    t_arr = jnp.asarray(triples["t"]) if "t" in triples else None
    n = users.shape[0]
    _check_nonempty(n, "basket triples")
    batch_size = _mesh_round_batch(min(batch_size, n), mesh)
    num_batches = -(-n // batch_size)
    padded_size = num_batches * batch_size

    loss_fn = _loss_with_dtype(model, compute_dtype)
    grad_fn = _make_grad_fn(loss_fn, mesh)

    def epoch_fn(params, opt_state, rng):
        rng, perm_key, k1, k2, k3, k_epoch = jax.random.split(rng, 6)
        order = _padded_order(jax.random.permutation(perm_key, n), padded_size)
        order = order.reshape(num_batches, batch_size)
        neg_shape = (num_batches, batch_size, n_neg)
        from ..ops.sampling import alias_negatives

        draw_u = (
            (lambda k: alias_negatives(k, neg_shape, *user_alias))
            if user_alias is not None
            else (lambda k: jax.random.randint(k, neg_shape, 0, n_users, dtype=jnp.int32))
        )
        draw_i = (
            (lambda k: alias_negatives(k, neg_shape, *item_alias))
            if item_alias is not None
            else (lambda k: jax.random.randint(k, neg_shape, 0, n_items, dtype=jnp.int32))
        )
        xs = (
            order,
            users[order],
            item1[order],
            item2[order],
            t_arr[order] if t_arr is not None else None,
            draw_u(k1),
            draw_i(k2),
            draw_i(k3),
            jax.random.split(k_epoch, num_batches),
        )

        def step(carry, x):
            params, opt_state = carry
            _, u, i1, i2, t, nu, ni1, ni2, k_loss = x
            batch = {
                "users": u,
                "item1": i1,
                "item2": i2,
                "neg_users": nu,
                "neg_item1": ni1,
                "neg_item2": ni2,
            }
            if t is not None:
                batch["t"] = t
            loss, grads = grad_fn(params, batch, k_loss)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(step, (params, opt_state), xs)
        return params, opt_state, rng, jnp.mean(losses)

    return jax.jit(epoch_fn, donate_argnums=(0, 1) if donate else ())


class TrainEngine:
    """Owns one training run: env prep, epoch loop, early stop, checkpointing."""

    def __init__(self, config):
        if not isinstance(config, Config):
            config = Config(config)
        self.config = config
        self.start_epoch = 0
        self.prepare_env()

    # -- environment --------------------------------------------------------------

    def prepare_env(self):
        """Run id, directories, seeding (reference train_engine.py:80-192)."""
        sys_cfg = self.config.system
        model_cfg = self.config.model
        timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")
        rand_tag = "".join(_py_random.choices(string.ascii_lowercase, k=6))
        self.model_run_id = (
            f"{model_cfg.get('model', 'model')}_{model_cfg.get('config_id', 'default')}"
            f"_{timestamp}_{rand_tag}"
        )
        root = sys_cfg.get("root_dir", ".")
        self.dirs = {}
        for key in ("log_dir", "result_dir", "process_dir", "checkpoint_dir", "run_dir", "tune_dir"):
            path = os.path.join(root, sys_cfg.get(key, key.replace("_dir", "s/")))
            ensure_dir(path)
            self.dirs[key] = path
        self.checkpoint_dir = os.path.join(self.dirs["checkpoint_dir"], self.model_run_id)
        self.result_file = os.path.join(
            self.dirs["result_dir"], sys_cfg.get("result_file", "result.csv")
        )
        seed = int(sys_cfg.get("seed", 2020))
        set_seed(seed)
        self.rng = jax.random.key(seed)
        # stdout/stderr tee into per-run log files (reference logger hijack,
        # utils/logger.py:60-110) — opt-in via system.log_to_file.
        self.run_logger = None
        if sys_cfg.get("log_to_file", False):
            from ..utils.logger import Logger

            self.run_logger = Logger(self.dirs["log_dir"], self.model_run_id)
        # Observability: TensorBoard scalars (optional) + jax.profiler traces.
        self.writer = None
        if sys_cfg.get("tensorboard", False):
            try:
                from tensorboardX import SummaryWriter

                self.writer = SummaryWriter(
                    os.path.join(self.dirs["run_dir"], self.model_run_id)
                )
                self.writer.add_text("config", str(self.config.to_dict()), 0)
            except ImportError:
                pass
        self.profile_dir = (
            os.path.join(self.dirs["run_dir"], self.model_run_id, "profile")
            if sys_cfg.get("profile", False)
            else None
        )

    # -- build --------------------------------------------------------------------

    def build(self, model, data, valid_candidates=None, test_candidates=None):
        """Wire the model + data into jitted train/eval functions."""
        self.model = model
        self.data = data
        model_cfg = self.config.model
        sys_cfg = self.config.system
        self.optimizer = make_optimizer(model_cfg)
        self.rng, init_key = jax.random.split(self.rng)
        self.params = model.init_params(init_key)
        # Optional device mesh: system.mesh = {"data": N, "model": M} or "auto"
        # (all devices on the data axis). Params are placed per the standard
        # rule (row-sharded embedding tables over "model").
        kind = getattr(model, "batch_kind", "pairwise")
        self.mesh = None
        mesh_cfg = sys_cfg.get("mesh")
        if mesh_cfg:
            from ..parallel.mesh import make_mesh

            if mesh_cfg == "auto":
                self.mesh = make_mesh()
            else:
                self.mesh = make_mesh(
                    n_data=int(mesh_cfg.get("data", 1)),
                    n_model=int(mesh_cfg.get("model", 1)),
                )
        # Sparse path builds pairwise BPR batches against model.row_loss; only
        # engage when that is actually the configured objective.
        sparse_req = model_cfg.get("sparse_optim", "auto")
        sparse_capable = hasattr(model, "row_tables") and kind == "pairwise"
        if sparse_req == "auto":
            # Auto-route (SCALING_REPORT "predicted v5e-16 efficiency"): on a
            # multi-device mesh a dense data-parallel step all-reduces the FULL
            # table gradient every step; once the row tables pass ~8 MB that
            # all-reduce alone (2 x bytes / 45 GB/s ICI >= ~0.36 ms) dwarfs an
            # embedding-model step, so the row-sharded sparse trainer (which
            # exchanges only touched rows) is the only path that can hold the
            # >=80% scaling-efficiency north star. Single-device runs keep the
            # dense path (it is faster below ~8k-row tables; ops/gather.py).
            table_bytes = 0
            if sparse_capable:
                table_bytes = sum(
                    self.params[t].size * self.params[t].dtype.itemsize
                    for t in model.row_tables()
                    if t in self.params
                )
            self._sparse_optim = (
                sparse_capable
                and self.mesh is not None
                and self.mesh.size > 1
                and table_bytes > AUTO_SPARSE_TABLE_BYTES
            )
            if self._sparse_optim:
                print(
                    f"[auto] routing to the row-sharded sparse trainer "
                    f"(row tables {table_bytes / 1e6:.1f} MB > "
                    f"{AUTO_SPARSE_TABLE_BYTES / 1e6:.0f} MB on a "
                    f"{self.mesh.size}-device mesh; dense all-reduce would "
                    f"break >=80% scaling efficiency). Set sparse_optim=false "
                    f"to force the dense path."
                )
        else:
            self._sparse_optim = bool(sparse_req) and sparse_capable
            if bool(sparse_req) and not self._sparse_optim:
                print(
                    "[warn] sparse_optim requested but the model/loss combination "
                    f"(batch_kind={kind}) has no row protocol; using the dense path"
                )
        if self.mesh is not None:
            from ..parallel.sharding import default_param_rule, shard_params

            if not self._sparse_optim:
                # Sparse runs place tables themselves (padded row shards +
                # sharded moments) — the generic placement would only cause
                # full-table device->host->device round trips.
                rule = default_param_rule(data.n_users, data.n_items)
                self.params = shard_params(self.params, self.mesh, rule)
                self._param_rule = rule
        if not self._sparse_optim:
            # sparse runs build their own (row-moment, dense) optimizer state;
            # dense Adam moments over full tables would be allocated for nothing
            self.opt_state = self.optimizer.init(self.params)
        neg_sampler = make_negative_sampler(data, model_cfg.get("neg_sampler", "auto"))
        # Mixed precision: model.compute_dtype (or system.compute_dtype)
        # = "bfloat16" runs the forward/backward on the MXU's native input
        # type with float32 master params/grads/moments (see _loss_with_dtype).
        compute_dtype = model_cfg.get("compute_dtype", sys_cfg.get("compute_dtype"))
        if self._sparse_optim:
            # Lazy-Adam row updates (core/sparse_optim): table-height-independent
            # step cost for production-scale embedding tables. With a mesh the
            # tables AND moments row-shard over "model" and batches over "data"
            # (make_sharded_sparse_epoch_fn — the BASELINE.json north star).
            from .sparse_optim import (
                init_sparse_state,
                make_sharded_sparse_epoch_fn,
                make_sparse_epoch_fn,
                shard_sparse_params,
            )

            lr = float(model_cfg.get("lr", 1e-3))
            table_names = list(model.row_tables())
            if self.mesh is not None:
                # Exchange strategies are config-overridable. Defaults by
                # regime (tools/strategy_comm.py wire model, BENCH_DETAILS
                # sharded_sparse_comm_model): the owner-filtered "bucketed"
                # exchange moves n_model/capacity_factor x fewer bytes than
                # the full all_gather and is exact while unique owned ids fit
                # capacity (capacity_factor sizes the headroom), so it is the
                # default once the model axis is wide enough to pay
                # (n_model >= 4: 3.8x less wire traffic); 2-way sharding
                # keeps the exact all_gather (same bytes either way).
                n_model = self.mesh.shape["model"]
                default_exchange = "bucketed" if n_model >= 4 else "allgather"
                self.epoch_fn = make_sharded_sparse_epoch_fn(
                    model,
                    data.train_arrays(),
                    int(model_cfg.get("batch_size", 256)),
                    neg_sampler,
                    lr=lr,
                    mesh=self.mesh,
                    dense_optimizer=self.optimizer,
                    compute_dtype=compute_dtype,
                    lookup_strategy=model_cfg.get("lookup_strategy", "psum"),
                    grad_exchange=model_cfg.get("grad_exchange", default_exchange),
                    capacity_factor=float(model_cfg.get("capacity_factor", 2.0)),
                )
                # Place params: row tables padded to the model axis and
                # sharded (pad rows are never touched by training or by
                # candidate eval, which only gathers real ids).
                self.params = shard_sparse_params(self.params, table_names, self.mesh)
            else:
                self.epoch_fn = make_sparse_epoch_fn(
                    model,
                    data.train_arrays(),
                    int(model_cfg.get("batch_size", 256)),
                    neg_sampler,
                    lr=lr,
                    dense_optimizer=self.optimizer,
                    compute_dtype=compute_dtype,
                    row_update=model_cfg.get("row_update", "auto"),
                )
            sparse_state = init_sparse_state(self.params, table_names)
            dense_params = {
                k: v for k, v in self.params.items() if k not in table_names
            }
            self.opt_state = (sparse_state, self.optimizer.init(dense_params))
        elif kind == "none":
            self.epoch_fn = None  # neighborhood models: nothing to train
        elif kind == "prefix":
            self.epoch_fn = make_prefix_epoch_fn(
                model,
                self.optimizer,
                data.prefix_target_arrays(int(model_cfg.get("maxlen", 19))),
                int(model_cfg.get("batch_size", 128)),
                mesh=self.mesh,
                compute_dtype=compute_dtype,
            )
        elif kind == "sequence_time":
            self.epoch_fn = make_sequence_time_epoch_fn(
                model,
                self.optimizer,
                data.tisasrec_arrays(model.maxlen, model.time_span),
                int(model_cfg.get("batch_size", 128)),
                neg_sampler=neg_sampler,
                mesh=self.mesh,
                compute_dtype=compute_dtype,
            )
        elif kind == "sequence":
            self.epoch_fn = make_sequence_epoch_fn(
                model,
                self.optimizer,
                data.train_seq_arrays(getattr(model, "maxlen", int(model_cfg.get("maxlen", 200)))),
                int(model_cfg.get("batch_size", 128)),
                neg_sampler=neg_sampler,
                mesh=self.mesh,
                compute_dtype=compute_dtype,
            )
        elif kind == "userrow":
            rows = model.artifacts.get("user_rows") if hasattr(model, "artifacts") else None
            if rows is None:
                import numpy as _np

                rows = _np.asarray(data.user_item_csr().todense(), dtype=_np.float32)
                rows = (rows > 0).astype(_np.float32)
            self.epoch_fn = make_userrow_epoch_fn(
                model, self.optimizer, rows, int(model_cfg.get("batch_size", 256)),
                mesh=self.mesh,
                compute_dtype=compute_dtype,
            )
        elif kind == "triple":
            from ..utils.alias_table import AliasTable
            from ..utils.constants import DEFAULT_ITEM_COL, DEFAULT_USER_COL

            triples = data.sample_triples(
                int(model_cfg.get("n_sample", 100_000)),
                time_step=int(model_cfg.get("time_step", 0)),
            )
            # popularity sampler over contiguous ids (reference draws
            # negatives from train-frequency AliasTables). r5 bisect on the
            # structured split (3 variants, seed 0): item-weighted negatives
            # lift ndcg@10 0.2322 -> 0.2592 (matching the reference's
            # 0.2608); user-weighted alone is neutral (0.2293); weighting
            # BOTH collapses training to 0.046 — so items are weighted by
            # default and user weighting is opt-in (user_neg_weighted).
            def _alias_pair(col, size):
                freq = np.bincount(
                    data.train[col].to_numpy(), minlength=size
                ).astype(np.float64)
                at = AliasTable(list(freq))
                return (jnp.asarray(at.prob_arr, jnp.float32),
                        jnp.asarray(at.alias_arr, jnp.int32))

            self.epoch_fn = make_triple_epoch_fn(
                model,
                self.optimizer,
                triples,
                int(model_cfg.get("batch_size", 256)),
                data.n_users,
                data.n_items,
                int(model_cfg.get("n_neg", 5)),
                mesh=self.mesh,
                compute_dtype=compute_dtype,
                user_alias=(_alias_pair(DEFAULT_USER_COL, data.n_users)
                            if model_cfg.get("user_neg_weighted", False)
                            else None),
                item_alias=_alias_pair(DEFAULT_ITEM_COL, data.n_items),
            )
        else:
            self.epoch_fn = make_epoch_fn(
                model,
                self.optimizer,
                data.train_arrays(),
                int(model_cfg.get("batch_size", 256)),
                neg_sampler=neg_sampler,
                num_neg=int(getattr(model, "num_neg", model_cfg.get("num_negative", 4))),
                mesh=self.mesh,
                compute_dtype=compute_dtype,
            )
        metrics = tuple(sys_cfg.get("metrics", ["ndcg", "precision", "recall", "map"]))
        ks = tuple(sys_cfg.get("k", [5, 10, 20]))
        self.valid_evaluator = (
            RankingEvaluator(model, valid_candidates, metrics, ks, mesh=self.mesh)
            if valid_candidates is not None
            else None
        )
        self.test_evaluator = (
            RankingEvaluator(model, test_candidates, metrics, ks, mesh=self.mesh)
            if test_candidates is not None
            else None
        )
        self.bookkeeper = EvalBookkeeper(
            valid_metric=sys_cfg.get("valid_metric", "ndcg"),
            valid_k=sys_cfg.get("valid_k", 10),
            max_n_update=int(model_cfg.get("max_n_update", MAX_N_UPDATE)),
        )
        return self

    # -- train loop ---------------------------------------------------------------

    def train(self, max_epoch=None, verbose=True):
        """Epoch loop with early stop + checkpoint-on-improvement.

        Returns {"valid_metric": best, "model_save_dir": ckpt_dir, ...}.
        """
        max_epoch = max_epoch or int(self.config.model.get("max_epoch", 100))
        start = time.time()
        if self.epoch_fn is None:
            # Non-gradient model (KNN family): evaluate once, checkpoint, done.
            valid_result = (
                self.valid_evaluator.evaluate(self.params) if self.valid_evaluator else {}
            )
            if valid_result:
                self.bookkeeper.update(0, valid_result)
                self.save_checkpoint(epoch=0)
            self.run_time = time.time() - start
            return {
                "valid_metric": self.bookkeeper.best_valid_performance,
                "best_epoch": 0,
                "model_save_dir": self.checkpoint_dir,
                "run_time": self.run_time,
            }
        if self.profile_dir:
            # Capture a device trace of the first post-compile epochs
            # (reference's @timeit + Monitor become jax.profiler traces here).
            jax.profiler.start_trace(self.profile_dir)
        # Resume-state cadence: write <ckpt_dir>/last every N epochs (0 = only
        # at the end of the loop), separate from the best-model checkpoint.
        save_last_every = int(self.config.system.get("save_last_every", 1))
        epoch = self.start_epoch - 1
        for epoch in range(getattr(self, "start_epoch", 0), max_epoch):
            t0 = time.time()
            self.params, self.opt_state, self.rng, loss = self.epoch_fn(
                self.params, self.opt_state, self.rng
            )
            loss = float(loss)
            train_time = time.time() - t0
            # Bucketed-exchange overflow: gradient rows dropped on capacity
            # overflow are counted on device (sparse_optim._bucket_by_owner)
            # and surfaced here per epoch — never silent (r3 advisor).
            if self._sparse_optim and isinstance(self.opt_state, tuple):
                dropped = int(self.opt_state[0].get("dropped", 0))
                prev = getattr(self, "_dropped_grad_rows", 0)
                if dropped > prev:
                    print(
                        f"WARNING: sharded-sparse bucketed exchange dropped "
                        f"{dropped - prev} gradient rows this epoch "
                        f"(cumulative {dropped}) — raise model config "
                        f"capacity_factor or set grad_exchange='allgather'"
                    )
                self._dropped_grad_rows = dropped
            valid_result = (
                self.valid_evaluator.evaluate(self.params) if self.valid_evaluator else {}
            )
            test_result = (
                self.test_evaluator.evaluate(self.params) if self.test_evaluator else {}
            )
            improved = (
                self.bookkeeper.update(epoch, valid_result, test_result)
                if valid_result
                else False
            )
            if improved:
                self.save_checkpoint(epoch=epoch, kind="best")
            if save_last_every and (epoch + 1) % save_last_every == 0:
                self.save_checkpoint(epoch=epoch, kind="last")
            if self.writer is not None:
                self.writer.add_scalar("model/loss", loss, epoch)
                for key, value in valid_result.items():
                    self.writer.add_scalar(f"performance/valid_{key}", value, epoch)
                for key, value in test_result.items():
                    self.writer.add_scalar(f"performance/test_{key}", value, epoch)
            if self.profile_dir and epoch == 1:
                jax.profiler.stop_trace()
                self.profile_dir = None
            if verbose:
                key = self.bookkeeper.key
                print(
                    f"[Epoch {epoch}] loss={loss:.4f} "
                    f"valid_{key}={valid_result.get(key, float('nan')):.4f} "
                    f"({train_time * 1000:.0f} ms)"
                    + (" *" if improved else "")
                )
            if valid_result and self.bookkeeper.should_stop:
                if verbose:
                    print(f"Early stop at epoch {epoch} (best epoch {self.bookkeeper.best_epoch})")
                break
        if self.profile_dir:
            jax.profiler.stop_trace()
            self.profile_dir = None
        if self.epoch_fn is not None and epoch >= self.start_epoch:
            self.save_checkpoint(epoch=epoch, kind="last")
        # A completed train() consumes any resume point: a later train() on
        # the same engine must run from epoch 0, not skip the resumed prefix.
        self.start_epoch = 0
        self.run_time = time.time() - start
        return {
            "valid_metric": self.bookkeeper.best_valid_performance,
            "best_epoch": self.bookkeeper.best_epoch,
            "model_save_dir": self.checkpoint_dir,
            "run_time": self.run_time,
        }

    # -- checkpointing ------------------------------------------------------------

    def save_checkpoint(self, epoch=None, kind="best"):
        """Persist FULL training state (params, opt moments, rng, bookkeeping).

        The reference saves only the model state_dict
        (beta_rec/models/torch_engine.py:70-73); persisting the optimizer state
        and RNG key as well makes an interrupted run resume bit-exactly.
        Backend is ``system.checkpoint_backend``: "flax" (msgpack file) or
        "orbax" (async-capable, sharded-array aware).

        Two DISTINCT artifacts (never conflated):
        - ``kind="best"`` → ``<checkpoint_dir>/`` — the best-valid-metric
          model, written on improvement; what ``test(use_best=True)`` and
          ``Recommender.load`` restore.
        - ``kind="last"`` → ``<checkpoint_dir>/last/`` — the resume state,
          written every ``system.save_last_every`` epochs; what
          ``resume_training`` continues from (the true interruption point).
        """
        backend = self.config.system.get("checkpoint_backend", "flax")
        ckpt_dir = (
            self.checkpoint_dir
            if kind == "best"
            else os.path.join(self.checkpoint_dir, "last")
        )
        save_checkpoint(
            ckpt_dir,
            {
                "params": self.params,
                "opt_state": self.opt_state,
                "rng": jax.random.key_data(self.rng),
            },
            backend=backend,
        )
        save_metadata(
            ckpt_dir,
            {
                "kind": kind,
                "best_valid_performance": self.bookkeeper.best_valid_performance,
                "best_epoch": self.bookkeeper.best_epoch,
                "n_no_update": self.bookkeeper.n_no_update,
                "epoch": self.bookkeeper.best_epoch if epoch is None else epoch,
                "model_run_id": self.model_run_id,
                "n_users": getattr(getattr(self, "data", None), "n_users", None),
                "n_items": getattr(getattr(self, "data", None), "n_items", None),
                "config": self.config.to_dict(),
            },
        )

    def has_checkpoint(self, kind="best"):
        """Whether a checkpoint artifact of the given kind exists on disk.

        (Directory existence is not enough: writing ``last/`` creates the
        parent best-dir as a side effect.)
        """
        ckpt_dir = (
            self.checkpoint_dir
            if kind == "best"
            else os.path.join(self.checkpoint_dir, "last")
        )
        return os.path.exists(os.path.join(ckpt_dir, "checkpoint.msgpack")) or os.path.isdir(
            os.path.join(ckpt_dir, "orbax_state")
        )

    def _restore_state(self, ckpt_dir):
        target = {
            "params": self.params,
            "opt_state": self.opt_state,
            "rng": jax.random.key_data(self.rng),
        }
        return load_checkpoint(
            ckpt_dir, target, backend=self.config.system.get("checkpoint_backend")
        )

    def load_params(self, ckpt_dir=None):
        """Return the checkpointed params WITHOUT mutating engine state.

        Serving/eval paths use this so scoring with the best checkpoint never
        side-effects ``self.params`` (training continuation and serving stay
        call-order independent).
        """
        return self._restore_state(ckpt_dir or self.checkpoint_dir)["params"]

    def resume_checkpoint(self, ckpt_dir=None):
        restored = self._restore_state(ckpt_dir or self.checkpoint_dir)
        self.params = restored["params"]
        self.opt_state = restored["opt_state"]
        self.rng = jax.random.wrap_key_data(jnp.asarray(restored["rng"]))
        self._replace_on_mesh()
        return self.params

    def _replace_on_mesh(self):
        """Re-place restored host arrays onto the configured mesh.

        The flax msgpack backend restores single-(host-)device arrays; without
        re-placement every subsequent sharded step would re-transfer them. The
        sparse path places tables + moments row-sharded (already-padded saved
        tables make the pad a no-op); the dense path replays the build rule.
        """
        if self.mesh is None:
            return
        if self._sparse_optim:
            from .sparse_optim import shard_sparse_params

            table_names = list(self.model.row_tables())
            self.params = shard_sparse_params(self.params, table_names, self.mesh)
            sparse_state, dense_state = self.opt_state
            moments = {
                name: tuple(
                    shard_sparse_params({name: mv}, table_names, self.mesh)[name]
                    for mv in pair
                )
                for name, pair in sparse_state["moments"].items()
            }
            self.opt_state = (
                {"moments": moments, "step": jnp.asarray(sparse_state["step"])},
                dense_state,
            )
        elif getattr(self, "_param_rule", None) is not None:
            from ..parallel.sharding import shard_params

            self.params = shard_params(self.params, self.mesh, self._param_rule)

    def resume_training(self, ckpt_dir=None):
        """Restore full state + early-stop bookkeeping; train() continues.

        Prefers the ``last/`` resume checkpoint (the interruption point) when
        present, falling back to the best-model checkpoint otherwise. Returns
        the epoch index training will resume from. The reference has no
        mid-run resume (SURVEY §5: "No optimizer/step state, no mid-epoch
        resume") — this is a capability the TPU build adds.
        """
        from .checkpoint import load_metadata

        ckpt_dir = ckpt_dir or self.checkpoint_dir
        last_dir = os.path.join(ckpt_dir, "last")
        if os.path.exists(last_dir):
            ckpt_dir = last_dir
        self.resume_checkpoint(ckpt_dir)
        meta = load_metadata(ckpt_dir)
        self.bookkeeper.best_valid_performance = float(meta["best_valid_performance"])
        self.bookkeeper.best_epoch = int(meta["best_epoch"])
        self.bookkeeper.n_no_update = int(meta.get("n_no_update", 0))
        self.start_epoch = int(meta.get("epoch", meta["best_epoch"])) + 1
        return self.start_epoch

    # -- final test ---------------------------------------------------------------

    def test(self, test_candidates_list, result_para=None, use_best=True, model=None):
        """Evaluate all n_test candidate copies with the best checkpoint.

        ``model`` overrides the scoring model (sequence recommenders score the
        final test against a train+valid context, reference
        eval_engine.test_seq_predict:319-375).

        Scoring uses the best checkpoint's params WITHOUT mutating
        ``self.params`` — training continuation after test() is unaffected.
        """
        params = self.params
        if use_best and self.has_checkpoint("best"):
            from .checkpoint import load_metadata

            try:
                meta = load_metadata(self.checkpoint_dir)
                if meta.get("kind", "best") != "best":
                    print(
                        f"[warn] checkpoint at {self.checkpoint_dir} is a "
                        f"'{meta.get('kind')}' (resume) checkpoint, not best-model"
                    )
            except FileNotFoundError:
                pass
            params = self.load_params()
        sys_cfg = self.config.system
        metrics = tuple(sys_cfg.get("metrics", ["ndcg", "precision", "recall", "map"]))
        ks = tuple(sys_cfg.get("k", [5, 10, 20]))
        scoring_model = model or self.model
        evaluators = [
            RankingEvaluator(scoring_model, cand, metrics, ks)
            for cand in test_candidates_list
        ]
        mean_row, rows = test_eval(
            evaluators,
            params,
            result_file=self.result_file,
            result_para=result_para or {},
            run_time=getattr(self, "run_time", None),
            save_mode=sys_cfg.get("save_mode", "average"),
            per_user_file=os.path.join(
                self.dirs["result_dir"], f"{self.model_run_id}_per_user.csv"
            ),
        )
        return mean_row
