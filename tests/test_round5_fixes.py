"""Round-5 fixes: ADVICE items + regression guards added this round."""

from beta_recsys_tpu.config import Config


def test_flat_config_without_model_or_dataset_keys_is_sectionized():
    """A flat reference config naming neither 'model' nor 'dataset' must still
    route its keys into sections instead of silently dropping them (ADVICE r4
    config/__init__.py:105)."""
    cfg = Config({"lr": 0.05, "test_rate": 0.2, "root_dir": "/tmp/x"})
    assert cfg.model["lr"] == 0.05
    assert cfg.dataset["test_rate"] == 0.2
    assert cfg.system["root_dir"] == "/tmp/x"


def test_config_contains_searches_sections():
    """Reference-style `"test_rate" in config` membership tests must see
    nested keys (ADVICE r4 config/__init__.py:117)."""
    cfg = Config({"system": {}, "dataset": {"test_rate": 0.2}, "model": {"lr": 0.1}})
    assert "dataset" in cfg  # section names still work
    assert "test_rate" in cfg
    assert "lr" in cfg
    assert "nonexistent_key" not in cfg


def test_sectioned_config_not_misdetected_as_flat():
    cfg = Config({"model": {"model": "MF", "lr": 0.1}})
    assert cfg.model["model"] == "MF"
    assert "lr" in cfg.model


def _toy_engine(tmp_path, emb_dim, mesh=None, sparse_override=None):
    import numpy as np
    import pandas as pd

    from beta_recsys_tpu.core.train_engine import TrainEngine
    from beta_recsys_tpu.data.base_data import BaseData
    from beta_recsys_tpu.models import build_model
    from beta_recsys_tpu.utils.constants import (
        DEFAULT_ITEM_COL, DEFAULT_RATING_COL, DEFAULT_TIMESTAMP_COL,
        DEFAULT_USER_COL,
    )

    # every user/item id appears, so table heights are exactly 1000/200 and
    # emb_dim alone controls the row-table byte size
    n, n_users, n_items = 2000, 1000, 200
    df = pd.DataFrame({
        DEFAULT_USER_COL: np.arange(n) % n_users,
        DEFAULT_ITEM_COL: np.arange(n) % n_items,
        DEFAULT_RATING_COL: np.ones(n, np.float32),
        DEFAULT_TIMESTAMP_COL: np.arange(n),
    })
    data = BaseData((df, [], []), intersect=False)
    system = {"root_dir": str(tmp_path), "metrics": ["ndcg"], "k": [10],
              "valid_metric": "ndcg", "valid_k": 10, "seed": 1}
    if mesh:
        system["mesh"] = mesh
    model_cfg = {"model": "MF", "emb_dim": emb_dim, "batch_size": 256, "loss": "bpr",
                 "optimizer": "adam", "lr": 0.05, "max_epoch": 1, "max_n_update": 1}
    if sparse_override is not None:
        model_cfg["sparse_optim"] = sparse_override
    cfg = Config({"system": system, "dataset": {"dataset": "synthetic"},
                  "model": model_cfg})
    model = build_model(cfg.model, data.n_users, data.n_items)
    engine = TrainEngine(cfg)
    engine.build(model, data, None, None)
    return engine


def test_auto_sparse_routing_large_table_on_mesh(tmp_path):
    """Large row tables (>8 MB) on a multi-device mesh auto-route to the
    row-sharded sparse trainer (VERDICT r4 #1: dense full-table all-reduce
    breaks the >=80% scaling north star)."""
    # 1200 rows x d=2048 x 4B = 9.8 MB of row tables
    eng = _toy_engine(tmp_path, 2048, mesh={"data": 4, "model": 2})
    assert eng._sparse_optim


def test_auto_sparse_routing_small_table_stays_dense(tmp_path):
    eng = _toy_engine(tmp_path, 16, mesh={"data": 4, "model": 2})
    assert not eng._sparse_optim


def test_auto_sparse_routing_needs_mesh(tmp_path):
    eng = _toy_engine(tmp_path, 2048, mesh=None)
    assert not eng._sparse_optim


def test_auto_sparse_routing_explicit_override(tmp_path):
    eng = _toy_engine(tmp_path, 2048, mesh={"data": 4, "model": 2},
                      sparse_override=False)
    assert not eng._sparse_optim


def test_alias_negatives_follow_frequency():
    """On-device alias draws approximate the source frequency distribution."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from beta_recsys_tpu.ops.sampling import alias_negatives
    from beta_recsys_tpu.utils.alias_table import AliasTable

    freq = [1.0, 0.0, 4.0, 10.0, 5.0]
    at = AliasTable(list(freq))
    draws = alias_negatives(
        jax.random.key(0), (40_000,),
        jnp.asarray(at.prob_arr, jnp.float32), jnp.asarray(at.alias_arr, jnp.int32))
    counts = np.bincount(np.asarray(draws), minlength=5) / 40_000
    expect = np.asarray(freq) / sum(freq)
    assert counts[1] == 0.0
    np.testing.assert_allclose(counts, expect, atol=0.02)


def test_basedata_does_not_mutate_input_split():
    """BaseData must copy its input frames: one split reused across runs
    (parity seed loops) must not inherit a previous run's id re-mapping
    (r5: collapsed every Triple2vec run after the first)."""
    import numpy as np
    import pandas as pd

    from beta_recsys_tpu.data.base_data import BaseData
    from beta_recsys_tpu.utils.constants import (
        DEFAULT_ITEM_COL, DEFAULT_RATING_COL, DEFAULT_TIMESTAMP_COL,
        DEFAULT_USER_COL,
    )

    def frame(users, items):
        return pd.DataFrame({
            DEFAULT_USER_COL: users, DEFAULT_ITEM_COL: items,
            DEFAULT_RATING_COL: np.ones(len(users), np.float32),
            DEFAULT_TIMESTAMP_COL: np.arange(len(users)),
        })

    train = frame([10, 20, 30, 10], [7, 8, 9, 8])
    valid = frame([20, 30], [9, 7])
    test = frame([10], [9])
    orig = (train.copy(), valid.copy(), test.copy())
    BaseData((train, [valid], [test]))
    pd.testing.assert_frame_equal(train, orig[0])
    pd.testing.assert_frame_equal(valid, orig[1])
    pd.testing.assert_frame_equal(test, orig[2])
