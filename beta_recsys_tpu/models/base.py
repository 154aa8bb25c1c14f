"""Functional model protocol shared by all recommenders.

TPU-first replacement for the reference's OO ModelEngine dispatch
(beta_rec/models/torch_engine.py:6-121): a model here is a *pure function
family* over a params pytree — ``init_params`` builds the pytree, ``loss``
is differentiated and jitted by the train engine, and the scoring functions
are jitted by the eval engine. Model objects hold only static hyperparameters
(shapes, layer sizes), so they can be closed over by jit without retracing.

Batch conventions by ``batch_kind``:
    pairwise:  {"users", "pos_items", "neg_items"}            (BPR-style)
    pointwise: {"users", "items", "labels"}                   (BCE-style)
    sequence:  {"users", "seq", "pos", "neg"}                 (SASRec-style)
    userrow:   {"rows"} dense user x item rows                (VAE-style)
    triple:    {"users", "item_i", "item_j"}                  (Triple2vec-style)
"""

import jax
import jax.numpy as jnp


class RecModel:
    """Base class: static hyperparams + pure param/scoring functions."""

    batch_kind = "pairwise"

    def __init__(self, config, n_users, n_items, artifacts=None):
        """``config`` is the model section (mapping); ``artifacts`` carries
        derived data (adjacency arrays, pretrained embeddings) explicitly —
        never through the config (unlike reference recommenders/lightgcn.py:95).
        """
        self.config = config
        self.n_users = n_users
        self.n_items = n_items
        self.artifacts = artifacts or {}
        self.emb_dim = int(config.get("emb_dim", 64))
        self.stddev = float(config.get("stddev", 0.1))

    # -- params -----------------------------------------------------------------

    def init_params(self, rng):
        raise NotImplementedError

    # -- scoring ----------------------------------------------------------------

    def user_item_embeddings(self, params):
        """Return (user_emb, item_emb) final embedding tables, or None if the
        model has no factorized form (then score_pairs must be overridden)."""
        return None

    def user_item_embeddings_trimmed(self, params):
        """``user_item_embeddings`` sliced to (n_users, n_items) rows.

        Tables may carry pad rows (multi-chip sparse training row-shards them
        over the mesh, core/sparse_optim.shard_sparse_params); retrieval
        surfaces must never rank pad items, so full-table consumers go through
        this trim (a no-op when tables are exact-size)."""
        embs = self.user_item_embeddings(params)
        if embs is None:
            return None
        u_emb, i_emb = embs
        return u_emb[: self.n_users], i_emb[: self.n_items]

    def retrieval_score_transform(self, params, scores):
        """Map raw factorized retrieval scores (dot products of the
        ``user_item_embeddings`` tables) onto the scale ``score_pairs``
        returns. Identity by default; models whose score_pairs applies a
        nonlinearity or a term absent from the factorized form (e.g. MF's
        sigmoid + global bias) override this so ``Recommender.recommend()``
        and ``predict()`` report consistent score scales."""
        return scores

    def score_pairs(self, params, users, items):
        """Score aligned (user, item) pairs -> (...,) float scores."""
        embs = self.user_item_embeddings(params)
        if embs is None:
            raise NotImplementedError
        u_emb, i_emb = embs
        return jnp.sum(u_emb[users] * i_emb[items], axis=-1)

    def score_candidates(self, params, users, cand_items):
        """Score per-user candidate sets: users (U,), cand_items (U, C) -> (U, C)."""
        embs = self.user_item_embeddings(params)
        if embs is not None:
            u_emb, i_emb = embs
            return jnp.einsum("ud,ucd->uc", u_emb[users], i_emb[cand_items])
        users_b = jnp.broadcast_to(users[:, None], cand_items.shape)
        return self.score_pairs(params, users_b, cand_items)

    def score_all(self, params, users):
        """Full-catalog scores: users (U,) -> (U, n_items)."""
        embs = self.user_item_embeddings_trimmed(params)
        if embs is not None:
            u_emb, i_emb = embs
            return u_emb[users] @ i_emb.T
        cand = jnp.broadcast_to(
            jnp.arange(self.n_items, dtype=jnp.int32)[None, :],
            (users.shape[0], self.n_items),
        )
        return self.score_candidates(params, users, cand)

    # -- training ---------------------------------------------------------------

    def loss(self, params, batch, rng):
        """Scalar training loss for one batch (differentiated by the engine)."""
        raise NotImplementedError

    # -- helpers ----------------------------------------------------------------

    def _normal(self, rng, shape):
        return self.stddev * jax.random.normal(rng, shape, dtype=jnp.float32)
