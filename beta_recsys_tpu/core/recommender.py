"""User-facing Recommender API: Model(config).train(data)/.test()/.predict()/.load().

Mirrors the reference's modern API surface (beta_rec/core/recommender.py:6-68,
recommenders/matrix_factorization.py:29-110) on top of the TPU engine. One
generic base covers the whole zoo; per-model subclasses (beta_recsys_tpu.
recommenders) override ``build_artifacts``/``data_class`` to provide derived
inputs (adjacency arrays, sequence contexts, pretrained embeddings) explicitly.
"""

import numpy as np
import pandas as pd

from ..config import Config, load_config
from ..data.base_data import BaseData
from ..models import build_model
from ..utils.constants import DEFAULT_ITEM_COL, DEFAULT_USER_COL
from ..utils.monitor import Monitor
from .train_engine import TrainEngine


class Recommender:
    """Generic config-driven recommender wrapper."""

    model_name = None  # registry key override; defaults to config model name
    data_class = BaseData

    def __init__(self, config):
        if isinstance(config, str):
            config = load_config(config)
        elif not isinstance(config, Config):
            config = Config(config)
        self.config = config
        self.engine = None
        self.model = None
        self.data = None

    # -- hooks ---------------------------------------------------------------------

    def build_artifacts(self, data):
        """Derived model inputs (adjacency, contexts, pretrained params)."""
        return {}

    def make_data(self, split_dataset, **kwargs):
        """Wrap a (train, valid, test) split into this model's data class."""
        return self.data_class(split_dataset, **kwargs)

    # -- API -----------------------------------------------------------------------

    def train(self, data):
        """Train on a BaseData-like object; returns valid metric + save dir."""
        if self.config.model.get("tune"):
            from ..experiment.tune import tune as run_tune

            return run_tune(self.__class__, self.config, data)

        self.data = data
        model_cfg = self.config.model
        artifacts = self.build_artifacts(data)
        self.model = build_model(
            model_cfg if self.model_name is None
            else model_cfg.replace(model=self.model_name),
            data.n_users,
            data.n_items,
            artifacts=artifacts,
        )
        self.engine = TrainEngine(self.config)
        monitor = Monitor(log_dir=self.engine.dirs["run_dir"], delay=1)
        valid_cand = data.eval_candidates(data.valid[0]) if data.valid else None
        test_cand = data.eval_candidates(data.test[0]) if data.test else None
        self.engine.build(self.model, data, valid_cand, test_cand)
        result = self.engine.train()
        self.run_time = monitor.stop()
        result["run_time"] = self.run_time
        return result

    def test_model(self):
        """The model used for final-test scoring; sequence recommenders
        override this to extend each user's context with validation items."""
        return self.model

    def test(self, test_df=None):
        """Final evaluation; defaults to all test candidate copies of the data."""
        assert self.engine is not None, "call train() first"
        if test_df is None:
            tests = self.data.test
        elif isinstance(test_df, pd.DataFrame):
            tests = [test_df]
        else:
            tests = list(test_df)
        candidates = [self.data.eval_candidates(df) for df in tests]
        result_para = {
            "model": self.config.model.get("model"),
            "dataset": self.config.dataset.get("dataset"),
            "data_split": self.config.dataset.get("data_split"),
        }
        return self.engine.test(
            candidates, result_para=result_para, model=self.test_model()
        )

    def _serving_params(self, use_best):
        """Params for serving: the best checkpoint when available (matching
        the metrics test() reports), else the live final-epoch params. Never
        mutates engine state, so serving is call-order independent."""
        if use_best and self.engine.has_checkpoint("best"):
            return self.engine.load_params()
        return self.engine.params

    def predict(self, data_df, use_best=True):
        """Scores for explicit (user, item) pairs in a DataFrame.

        ``use_best=True`` (default) scores with the best validation
        checkpoint — the model whose metrics test() reports — rather than the
        final-epoch params.
        """
        assert self.model is not None, "call train() or load() first"
        import jax.numpy as jnp

        users = jnp.asarray(data_df[DEFAULT_USER_COL].to_numpy(np.int32))
        items = jnp.asarray(data_df[DEFAULT_ITEM_COL].to_numpy(np.int32))
        scores = self.model.score_pairs(self._serving_params(use_best), users, items)
        return np.asarray(scores)

    def recommend(self, users=None, k=10, exclude_train=True, user_block=4096, item_block=8192, use_best=True, mode="exact", score_dtype=None):
        """Top-k item recommendations per user — the serving surface.

        The reference has no retrieval API (its `predict` only scores explicit
        pairs, beta_rec/core/recommender.py:58-62); this runs on-device
        streaming top-k for factorized models (O(block) memory at any catalog
        size) and blocked `score_all` + `lax.top_k` otherwise. Scores come
        back through the model's ``retrieval_score_transform`` so the
        prediction column is on the same scale predict() returns.

        ``use_best=True`` (default) serves the best validation checkpoint.
        Returns a DataFrame with columns (user, item, prediction, rank).
        """
        assert self.model is not None, "call train() or load() first"
        import jax
        import jax.numpy as jnp

        from ..ops.topk import exclusion_lists, retrieval_topk, streaming_topk
        from ..utils.constants import DEFAULT_PREDICTION_COL

        model = self.test_model()
        params = self._serving_params(use_best)
        if users is None:
            users = np.arange(model.n_users, dtype=np.int32)
        users = np.asarray(users, dtype=np.int32)
        if exclude_train and self.data is None:
            raise ValueError(
                "exclude_train=True needs the training data to know which "
                "items to exclude — pass data= to load(), or exclude_train=False"
            )
        train_csr = self.data.user_item_csr() if exclude_train else None
        excl_all = exclusion_lists(train_csr) if train_csr is not None else None
        # post-filter exclusion is exact while k + max_degree candidates fit a
        # sane reduce width; heavy-degree catalogs fall back to the streaming
        # mask path
        use_fast = excl_all is None or excl_all.shape[1] + k <= 256

        embs = model.user_item_embeddings_trimmed(params)
        out_users, out_items, out_scores = [], [], []
        for start in range(0, len(users), user_block):
            blk = users[start : start + user_block]
            if embs is not None and use_fast:
                # fast path (tools/prof_retrieval2.py: 15x the streaming
                # merge): one bf16 MXU matmul over the catalog + exact top-k
                # of k+T with per-user post-filter
                u_emb, i_emb = embs
                ex = (jnp.asarray(excl_all[blk]) if excl_all is not None
                      else None)
                # default fp32 scores keep recommend()'s predictions on
                # predict()'s exact scale (tested); mode="approx" +
                # score_dtype="bfloat16" is the high-throughput serving
                # setting (700k users/s over 162k items, 0.973 top-10
                # recall — docs/benchmarks.md)
                scores, idx = retrieval_topk(
                    u_emb[jnp.asarray(blk)], jnp.asarray(i_emb), k,
                    exclude_list=ex, mode=mode, score_dtype=score_dtype,
                )
                scores = model.retrieval_score_transform(params, scores)
            elif embs is not None:
                u_emb, i_emb = embs
                mask = jnp.asarray(np.asarray(train_csr[blk].todense()) > 0)
                scores, idx = streaming_topk(
                    u_emb[jnp.asarray(blk)], i_emb, k, block=item_block, exclude_mask=mask
                )
                scores = model.retrieval_score_transform(params, scores)
            else:
                mask = None
                if train_csr is not None:
                    mask = jnp.asarray(np.asarray(train_csr[blk].todense()) > 0)
                all_scores = model.score_all(params, jnp.asarray(blk))[:, : model.n_items]
                if mask is not None:
                    all_scores = jnp.where(mask, -jnp.inf, all_scores)
                scores, idx = jax.lax.top_k(all_scores, k)
            scores, idx = np.asarray(scores), np.asarray(idx)
            out_users.append(np.repeat(blk, k))
            out_items.append(idx.reshape(-1))
            out_scores.append(scores.reshape(-1))
        return pd.DataFrame(
            {
                DEFAULT_USER_COL: np.concatenate(out_users),
                DEFAULT_ITEM_COL: np.concatenate(out_items),
                DEFAULT_PREDICTION_COL: np.concatenate(out_scores),
                "rank": np.tile(np.arange(1, k + 1), sum(len(u) for u in out_users) // k),
            }
        )

    def export_embeddings(self, path, use_best=True):
        """Write the model's final user/item embedding tables to an ``.npz``.

        The factorized serving artifact: feed these into an ANN index (ScaNN/
        FAISS-style) for production retrieval. For propagation models
        (LightGCN etc.) the exported tables are the PROPAGATED embeddings, so
        dot products reproduce the model's scores without running the graph
        at query time. Raises for models with no factorized form.
        """
        assert self.model is not None, "call train() or load() first"
        model = self.test_model()
        params = self._serving_params(use_best)
        embs = model.user_item_embeddings_trimmed(params)
        if embs is None:
            raise ValueError(
                f"{type(model).__name__} has no factorized (user_emb, item_emb) "
                "form; serve it through recommend() instead"
            )
        u_emb, i_emb = embs
        np.savez_compressed(
            path, user_emb=np.asarray(u_emb), item_emb=np.asarray(i_emb)
        )
        return path

    def load(self, model_dir, data=None):
        """Restore the best checkpoint from a save dir.

        Works COLD — in a fresh process with no prior train() — by rebuilding
        the model from the checkpoint metadata (n_users/n_items persisted at
        save time) and mapping the stored params onto it. Models whose scoring
        needs derived artifacts (graph adjacency, sequence contexts) must be
        given ``data`` so ``build_artifacts`` can run; factorized models load
        with nothing but the directory.
        """
        if self.engine is not None:
            self.engine.resume_checkpoint(model_dir)
            return self

        import jax
        from flax import serialization

        from ..core.checkpoint import load_metadata, load_raw_checkpoint
        from .train_engine import make_optimizer

        meta = load_metadata(model_dir)
        n_users, n_items = meta.get("n_users"), meta.get("n_items")
        if n_users is None or n_items is None:
            raise ValueError(
                f"checkpoint at {model_dir} lacks n_users/n_items metadata "
                "(saved by an older version?) — pass data= or call train() first"
            )
        if data is not None:
            self.data = data
        artifacts = self.build_artifacts(self.data) if self.data is not None else {}
        model_cfg = self.config.model
        self.model = build_model(
            model_cfg if self.model_name is None
            else model_cfg.replace(model=self.model_name),
            int(n_users),
            int(n_items),
            artifacts=artifacts,
        )
        engine = TrainEngine(self.config)
        engine.model = self.model
        engine.data = self.data
        engine.rng, init_key = jax.random.split(engine.rng)
        template = self.model.init_params(init_key)
        raw = load_raw_checkpoint(
            model_dir, backend=self.config.system.get("checkpoint_backend")
        )
        engine.params = serialization.from_state_dict(template, raw["params"])
        engine.optimizer = make_optimizer(model_cfg)
        engine.opt_state = engine.optimizer.init(engine.params)
        engine.checkpoint_dir = model_dir
        self.engine = engine
        return self
