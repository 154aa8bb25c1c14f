"""NCF warm-start from pretrained GMF/MLP (reference ncf_pre mode)."""

import jax
import numpy as np

from beta_recsys_tpu.models.gmf import GMF
from beta_recsys_tpu.models.mlp import MLP
from beta_recsys_tpu.models.ncf import NeuMF

N_USERS, N_ITEMS = 20, 30


def test_neumf_warm_start_uses_pretrained_tables():
    gmf = GMF({"model": "GMF", "emb_dim": 8}, N_USERS, N_ITEMS)
    gmf_params = gmf.init_params(jax.random.key(0))
    mlp = MLP({"model": "MLP", "emb_dim": 8, "mlp_config": {"n_layers": 2}}, N_USERS, N_ITEMS)
    mlp_params = mlp.init_params(jax.random.key(1))

    ncf = NeuMF(
        {"model": "NCF", "emb_dim": 8, "mlp_config": {"n_layers": 2}},
        N_USERS, N_ITEMS,
        artifacts={"gmf_params": gmf_params, "mlp_params": mlp_params},
    )
    params = ncf.init_params(jax.random.key(2))
    np.testing.assert_array_equal(
        np.asarray(params["user_emb_gmf"]), np.asarray(gmf_params["user_emb"])
    )
    np.testing.assert_array_equal(
        np.asarray(params["item_emb_mlp"]), np.asarray(mlp_params["item_emb"])
    )
    np.testing.assert_array_equal(
        np.asarray(params["layers"][0]["w"]), np.asarray(mlp_params["layers"][0]["w"])
    )
    # and the fused model still scores/differentiates
    users = jax.numpy.arange(4, dtype=jax.numpy.int32)
    items = jax.numpy.arange(4, dtype=jax.numpy.int32)
    scores = ncf.score_pairs(params, users, items)
    assert scores.shape == (4,) and np.all(np.isfinite(np.asarray(scores)))
