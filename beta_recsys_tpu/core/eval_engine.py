"""On-device evaluation engine: jitted candidate scoring + metric reductions.

TPU-first replacement for the reference EvalEngine
(beta_rec/core/eval_engine.py:186-622): where the reference copies predictions
to host and runs pandas metrics in worker threads with lock-guarded shared
state, here one jitted function scores all candidate sets and reduces every
metric@k on device. Evaluation is synchronous but typically runs in
milliseconds, so the reference's 'don't block training' thread machinery is
unnecessary — the benign data race noted in SURVEY §5 is eliminated by design.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..ops import metrics as device_metrics
from ..utils.common import save_to_csv
from ..utils.constants import MAX_N_UPDATE


def _shard_rows(mesh, *arrays):
    """Constrain each array's leading (user) dim to shard over "data"."""
    if mesh is None:
        return arrays
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    return tuple(jax.lax.with_sharding_constraint(a, sharding) for a in arrays)


class RankingEvaluator:
    """Jitted ranked evaluation over fixed candidate sets (1 pos + n negatives).

    With ``mesh`` the user rows are padded to the data-axis size and sharded
    over it, so each chip scores its own slice of users and the metric means
    reduce with one psum — multi-chip evaluation with zero host logic. Padded
    rows have empty masks (contribute 0 to every metric mean); the means are
    rescaled by padded/real so values are exactly the single-chip ones.
    """

    def __init__(self, model, candidates, metrics=("ndcg", "precision", "recall", "map"), ks=(5, 10, 20), mesh=None):
        self.model = model
        self.metrics = tuple(metrics)
        self.ks = tuple(int(k) for k in ks)
        self.mesh = mesh
        users = np.asarray(candidates.users)
        items = np.asarray(candidates.items)
        relevance = np.asarray(candidates.relevance)
        mask = np.asarray(candidates.mask)
        n_real = users.shape[0]
        scale = 1.0
        if mesh is not None and n_real:
            n_data = mesh.shape["data"]
            pad = (-n_real) % n_data
            if pad:
                users = np.concatenate([users, np.repeat(users[-1:], pad, axis=0)])
                items = np.concatenate([items, np.repeat(items[-1:], pad, axis=0)])
                relevance = np.concatenate(
                    [relevance, np.zeros((pad,) + relevance.shape[1:], relevance.dtype)]
                )
                mask = np.concatenate([mask, np.zeros((pad,) + mask.shape[1:], mask.dtype)])
                scale = (n_real + pad) / n_real
        self.users = jnp.asarray(users)
        self.items = jnp.asarray(items)
        self.relevance = jnp.asarray(relevance)
        self.mask = jnp.asarray(mask)

        def _eval(params):
            u, it, rel, mk = _shard_rows(
                mesh, self.users, self.items, self.relevance, self.mask
            )
            scores = model.score_candidates(params, u, it)
            out = device_metrics.ranking_metrics(scores, rel, mk, self.metrics, self.ks)
            return {k: v * scale for k, v in out.items()}

        self._eval = jax.jit(_eval)

    def evaluate(self, params):
        """Return {metric@k: float} for the model parameters."""
        # Single host transfer for all metric scalars: per-metric float() would
        # pay one device roundtrip each (costly on remote/tunneled TPUs).
        out = jax.device_get(self._eval(params))
        return {k: float(v) for k, v in out.items()}


class FullCatalogEvaluator:
    """Jitted full-catalog top-k evaluation (train positives masked out).

    The reference's pandas groupby-nlargest path (utils/evaluation.py:755-785)
    becomes a blocked, on-device ``lax.top_k`` over (batch_users, n_items)
    score matrices — the mode to use when candidates are 'all items'.
    """

    def __init__(self, model, users, relevance_csr, train_csr, metrics=("ndcg", "precision", "recall", "map"), ks=(5, 10, 20), user_block=1024, mesh=None):
        self.model = model
        self.metrics = tuple(metrics)
        self.ks = tuple(int(k) for k in ks)
        if mesh is not None:
            # Each chip scores user_block/n_data users of the block; the
            # padded-block accounting in evaluate() already corrects means.
            n_data = mesh.shape["data"]
            user_block = max(user_block // n_data, 1) * n_data
        self.user_block = user_block
        self.mesh = mesh
        self.users = np.asarray(users, dtype=np.int32)

        # Precompute per-block COO ONCE (round-2 review: .todense() per block
        # per eval churned ~660MB of host memory per block at ml-25m scale,
        # every epoch). The dense (B, n_items) relevance/train-mask blocks are
        # now built ON DEVICE by a scatter from these cached index arrays —
        # the host does no per-eval work beyond handing over cached arrays.
        # non-canonical CSRs (explicit duplicate entries) must sum, matching
        # the todense() semantics this scatter path replaced (r3 advisor)
        relevance_csr = relevance_csr.copy()
        relevance_csr.sum_duplicates()
        train_csr = train_csr.copy()
        train_csr.sum_duplicates()

        B = user_block
        n_blocks = -(-len(self.users) // B)  # 0 users -> no blocks (r3 advisor)
        blocks = []
        for start in range(0, n_blocks * B, B):
            blk = self.users[start : start + B]
            pad = B - len(blk)
            blk_padded = np.pad(blk, (0, pad), mode="edge") if pad else blk
            coo = []
            for csr, keep_pad in ((relevance_csr, False), (train_csr, True)):
                sub = csr[blk_padded].tocoo()
                rows, cols, data = sub.row, sub.col, sub.data
                if pad and not keep_pad:
                    # padded (duplicated) users must contribute no relevance
                    keep = rows < len(blk)
                    rows, cols, data = rows[keep], cols[keep], data[keep]
                coo.append((rows.astype(np.int32), cols.astype(np.int32),
                            data.astype(np.float32)))
            blocks.append((blk_padded, coo))
        # one jit: pad every block's COO to the global max nnz (pad entries
        # write out of bounds -> dropped)
        max_rel = max((len(c[0][0]) for _, c in blocks), default=1) or 1
        max_trn = max((len(c[1][0]) for _, c in blocks), default=1) or 1

        def _pad_coo(rows, cols, data, target, n_rows):
            pad = target - len(rows)
            if pad:
                rows = np.concatenate([rows, np.full(pad, n_rows, np.int32)])
                cols = np.concatenate([cols, np.zeros(pad, np.int32)])
                data = np.concatenate([data, np.zeros(pad, np.float32)])
            return rows, cols, data

        self._blocks = []
        for blk_padded, (rel_coo, trn_coo) in blocks:
            self._blocks.append(
                (
                    jnp.asarray(blk_padded),
                    tuple(map(jnp.asarray, _pad_coo(*rel_coo, max_rel, B))),
                    tuple(map(jnp.asarray, _pad_coo(*trn_coo, max_trn, B))),
                )
            )

        n_items = model.n_items

        def _score_block(params, users_blk, rel_coo, trn_coo):
            rel_blk = jnp.zeros((B, n_items), jnp.float32).at[rel_coo[0], rel_coo[1]].set(
                rel_coo[2], mode="drop"
            )
            train_blk = jnp.zeros((B, n_items), jnp.float32).at[trn_coo[0], trn_coo[1]].set(
                trn_coo[2], mode="drop"
            )
            users_blk, rel_blk, train_blk = _shard_rows(mesh, users_blk, rel_blk, train_blk)
            # tables may carry pad rows (sharded sparse training); pad items
            # must never be ranked
            scores = model.score_all(params, users_blk)[:, : model.n_items]
            scores = jnp.where(train_blk > 0, device_metrics.NEG_INF, scores)
            mask = jnp.ones_like(scores, dtype=bool)
            return device_metrics.ranking_metrics(scores, rel_blk, mask, self.metrics, self.ks)

        self._score_block = jax.jit(_score_block)

    def evaluate(self, params):
        """Average metric@k over all users, evaluated in fixed-size blocks."""
        totals = {}
        B = self.user_block
        for users_blk, rel_coo, trn_coo in self._blocks:
            out = jax.device_get(self._score_block(params, users_blk, rel_coo, trn_coo))
            for k, v in out.items():
                # each block metric is a mean over B rows (padded rows are 0);
                # v * B recovers the block's per-user sum
                totals[k] = totals.get(k, 0.0) + float(v) * B
        return {k: v / max(len(self.users), 1) for k, v in totals.items()}


class TopKRetrievalEvaluator:
    """Full-catalog ranked eval via device top-k (no dense metric matrix).

    For factorized models (user_item_embeddings) at large catalogs: per user
    block, one retrieval call returns max_k items (train positives excluded
    on device); metrics come from the relevance of those k items plus the
    per-user relevant counts — identical math to FullCatalogEvaluator at a
    fraction of the memory (SURVEY §7 full-catalog hard part).

    Retrieval path (r5): when k + max train degree fits the post-filter
    buffer, one exact matmul + ``lax.top_k`` of k+T with per-user exclusion
    post-filter (ops.topk.retrieval_topk — the measured-fast path); heavier
    exclusion degrees fall back to the streaming merge with an on-device
    scatter mask. ``mode="approx"`` switches to ``lax.approx_max_k`` (the
    serving path, ~0.97 top-10 recall, ~3x faster) for quick sweeps where
    approximate metrics are acceptable.
    """

    def __init__(self, model, users, relevance_csr, train_csr, metrics=("ndcg", "precision", "recall", "map"), ks=(5, 10, 20), user_block=1024, item_block=8192, mode="exact"):
        from ..ops.topk import streaming_topk

        self.mode = mode
        self.model = model
        self.metrics = tuple(metrics)
        self.ks = tuple(int(k) for k in ks)
        self.max_k = max(self.ks)
        self.user_block = user_block
        self.item_block = item_block
        self.users = np.asarray(users, dtype=np.int32)
        self._streaming_topk = streaming_topk

        # Precompute per-block artifacts ONCE (round-2 review: todense() +
        # scipy fancy-indexing per block per eval). Per eval, the host only
        # hands cached arrays to the device: the train exclude-mask is built
        # by an on-device scatter, and top-item relevance by an on-device
        # padded-membership compare against each user's relevant-item list.
        # All blocks are padded to ONE shape (user rows to user_block, train
        # COO to the global max nnz, relevance lists to the global max R) so
        # the jitted _top_rel compiles exactly once — block-dependent shapes
        # previously retraced per block: hundreds of XLA compiles on first
        # eval at ml-25m scale (r3 advisor). Padded user rows carry zero
        # relevance and actual=0, so every metric term they produce is 0;
        # padded COO entries scatter to row B -> mode="drop". Mirrors
        # FullCatalogEvaluator's "one jit" padding.
        relevance_csr = relevance_csr.copy()
        relevance_csr.sum_duplicates()
        train_csr = train_csr.copy()
        train_csr.sum_duplicates()
        n_items = model.n_items
        B = user_block
        raw_blocks = []
        for start in range(0, len(self.users), B):
            blk = self.users[start : start + B]
            n_real = len(blk)
            blk_padded = np.pad(blk, (0, B - n_real), mode="edge") if n_real < B else blk
            sub = train_csr[blk_padded].tocoo()
            rel_rows = relevance_csr[blk]
            raw_blocks.append((blk_padded, n_real, sub, rel_rows))
        max_nnz = max((len(b[2].row) for b in raw_blocks), default=1) or 1
        max_R = max(
            (int(np.diff(b[3].indptr).max()) if b[3].indptr[-1] else 1 for b in raw_blocks),
            default=1,
        ) or 1
        self._blocks = []
        for blk_padded, n_real, sub, rel_rows in raw_blocks:
            trn_rows = np.full(max_nnz, B, np.int32)  # row B -> dropped
            trn_cols = np.zeros(max_nnz, np.int32)
            trn_rows[: len(sub.row)] = sub.row
            trn_cols[: len(sub.col)] = sub.col
            rel_items = np.full((B, max_R), n_items, np.int32)  # n_items = "none"
            rel_vals = np.zeros((B, max_R), np.float32)
            for i in range(n_real):
                s, e = rel_rows.indptr[i], rel_rows.indptr[i + 1]
                rel_items[i, : e - s] = rel_rows.indices[s:e]
                rel_vals[i, : e - s] = rel_rows.data[s:e]
            actual = np.zeros(B, np.float64)
            actual[:n_real] = np.asarray(rel_rows.sum(axis=1)).flatten()
            self._blocks.append(
                (
                    jnp.asarray(blk_padded),
                    (jnp.asarray(trn_rows), jnp.asarray(trn_cols)),
                    jnp.asarray(rel_items),
                    jnp.asarray(rel_vals),
                    actual,
                )
            )

        # r5 fast path precompute: per-block padded exclusion lists (B, T).
        # Post-filter exclusion is exact while max_k + T fits the reduce
        # buffer; otherwise keep the streaming mask path.
        max_deg = max((int(np.diff(b[2].tocsr().indptr).max())
                       if b[2].nnz else 0 for b in raw_blocks), default=0)
        self._use_fast = self.max_k + max_deg <= 256
        if self._use_fast:
            from ..ops.topk import retrieval_topk

            t_pad = max(max_deg, 1)
            self._excl_blocks = []
            for blk_padded, n_real, sub, _ in raw_blocks:
                ex = np.full((B, t_pad), -1, np.int32)
                cnt = np.zeros(B, np.int64)
                for r, c in zip(sub.row, sub.col):
                    ex[r, cnt[r]] = c
                    cnt[r] += 1
                self._excl_blocks.append(jnp.asarray(ex))

            def _top_rel_fast(u_emb_blk, i_emb_all, excl, rel_items, rel_vals):
                _, top_idx = retrieval_topk(
                    u_emb_blk, i_emb_all, self.max_k, exclude_list=excl,
                    mode=self.mode,
                    score_dtype="bfloat16" if self.mode == "approx" else None,
                )
                hit = top_idx[:, :, None] == rel_items[:, None, :]
                return top_idx, jnp.sum(hit * rel_vals[:, None, :], axis=2)

            self._top_rel_fast = jax.jit(_top_rel_fast)

        def _top_rel(u_emb_blk, i_emb_all, trn_rows, trn_cols, rel_items, rel_vals, n_rows):
            excl = jnp.zeros((n_rows, n_items), bool).at[trn_rows, trn_cols].set(
                True, mode="drop"
            )
            _, top_idx = streaming_topk(
                u_emb_blk, i_emb_all, self.max_k, block=self.item_block,
                exclude_mask=excl,
            )
            # (B, K, R) membership: relevance value of each retrieved item
            hit = top_idx[:, :, None] == rel_items[:, None, :]
            return top_idx, jnp.sum(hit * rel_vals[:, None, :], axis=2)

        self._top_rel = jax.jit(_top_rel, static_argnames=("n_rows",))

    def evaluate(self, params):
        import jax.numpy as jnp

        u_emb_all, i_emb_all = self.model.user_item_embeddings_trimmed(params)
        totals = {f"{m}@{k}": 0.0 for m in self.metrics for k in self.ks}
        for bi, (blk_ids, (trn_rows, trn_cols), rel_items, rel_vals, actual) in enumerate(self._blocks):
            if self._use_fast:
                _, top_rel = self._top_rel_fast(
                    u_emb_all[blk_ids], i_emb_all, self._excl_blocks[bi],
                    rel_items, rel_vals,
                )
            else:
                _, top_rel = self._top_rel(
                    u_emb_all[blk_ids], i_emb_all, trn_rows, trn_cols,
                    rel_items, rel_vals, n_rows=int(blk_ids.shape[0]),
                )
            top_rel = np.asarray(top_rel)
            ranks = np.arange(1, self.max_k + 1)
            gains = 1.0 / np.log1p(ranks)
            cum_hits = np.cumsum(top_rel, axis=1)
            for k in self.ks:
                hits_k = cum_hits[:, k - 1]
                safe_actual = np.maximum(actual, 1)
                totals[f"precision@{k}"] = totals.get(f"precision@{k}", 0.0)
                if "precision" in self.metrics:
                    totals[f"precision@{k}"] += float(np.sum(hits_k / k))
                if "recall" in self.metrics:
                    totals[f"recall@{k}"] += float(
                        np.sum(np.where(actual > 0, hits_k / safe_actual, 0.0))
                    )
                if "ndcg" in self.metrics:
                    dcg = np.sum(top_rel[:, :k] * gains[:k], axis=1)
                    ideal_prefix = np.cumsum(gains[:k])
                    idcg = ideal_prefix[np.clip(np.minimum(actual, k).astype(int) - 1, 0, k - 1)]
                    totals[f"ndcg@{k}"] += float(
                        np.sum(np.where(actual > 0, dcg / idcg, 0.0))
                    )
                if "map" in self.metrics:
                    rr = np.sum(top_rel[:, :k] * cum_hits[:, :k] / ranks[:k], axis=1)
                    totals[f"map@{k}"] += float(
                        np.sum(np.where(actual > 0, rr / safe_actual, 0.0))
                    )
        n = max(len(self.users), 1)
        return {key: v / n for key, v in totals.items() if key.split("@")[0] in self.metrics}


class EvalBookkeeper:
    """Early-stop / best-metric tracking (synchronous, no threads or locks)."""

    def __init__(self, valid_metric="ndcg", valid_k=10, max_n_update=MAX_N_UPDATE):
        self.key = f"{valid_metric}@{valid_k}"
        self.max_n_update = max_n_update
        self.best_valid_performance = 0.0
        self.best_epoch = -1
        self.n_no_update = 0
        self.history = []

    def update(self, epoch, valid_result, test_result=None):
        """Record an epoch's results; returns True if the valid metric improved."""
        score = valid_result[self.key]
        self.history.append(
            {"epoch": epoch, "valid": dict(valid_result), "test": dict(test_result or {})}
        )
        if score > self.best_valid_performance:
            self.best_valid_performance = score
            self.best_epoch = epoch
            self.n_no_update = 0
            return True
        self.n_no_update += 1
        return False

    @property
    def should_stop(self):
        return self.n_no_update >= self.max_n_update


def test_eval(evaluators, params, result_file=None, result_para=None, run_time=None, save_mode="average", per_user_file=None):
    """Final test evaluation over n_test candidate copies -> averaged metrics.

    Mirrors reference EvalEngine.test_eval (core/eval_engine.py:585-604): each
    copy is evaluated, the mean row (+ config columns + run_time) is appended
    to the results CSV. With ``save_mode == "per_user"`` the per-user candidate
    predictions of the first copy are dumped to CSV as well
    (reference eval_engine.py:173-182).
    """
    rows = [ev.evaluate(params) for ev in evaluators]
    mean_row = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]} if rows else {}
    if result_file:
        record = dict(mean_row)
        if run_time is not None:
            record["run_time"] = run_time
        record["time"] = time.strftime("%Y-%m-%d %H:%M:%S")
        for k, v in (result_para or {}).items():
            record[k] = str(v)
        save_to_csv(pd.DataFrame([record]), result_file)
    if save_mode == "per_user" and evaluators and per_user_file:
        ev = evaluators[0]
        scores = np.asarray(ev.model.score_candidates(params, ev.users, ev.items))
        mask = np.asarray(ev.mask)
        users_mat = np.broadcast_to(np.asarray(ev.users)[:, None], mask.shape)
        pd.DataFrame(
            {
                "col_user": users_mat[mask],
                "col_item": np.asarray(ev.items)[mask],
                "col_rating": np.asarray(ev.relevance)[mask],
                "col_prediction": scores[mask],
            }
        ).to_csv(per_user_file, index=False)
    return mean_row, rows
