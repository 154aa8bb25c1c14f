"""End-to-end MF training smoke test: synthetic data -> split -> train -> eval.

The first milestone path from SURVEY.md §7.4: config → split → jitted epoch
loop → early stop → checkpoint → results CSV, asserting the model actually
learns (valid ndcg@10 well above the random-ranking baseline).
"""

import os

import numpy as np
import pandas as pd
import pytest

from beta_recsys_tpu.config import Config
from beta_recsys_tpu.core.train_engine import TrainEngine
from beta_recsys_tpu.data.base_data import BaseData
from beta_recsys_tpu.datasets.data_split import feed_neg_sample, leave_one_out
from beta_recsys_tpu.models import build_model
from beta_recsys_tpu.utils.alias_table import AliasTable
from beta_recsys_tpu.utils.constants import (
    DEFAULT_FLAG_COL,
    DEFAULT_ITEM_COL,
    DEFAULT_RATING_COL,
    DEFAULT_TIMESTAMP_COL,
    DEFAULT_USER_COL,
)


def make_structured_interactions(n_users=60, n_items=40, per_user=8, seed=0):
    """Synthetic data with block structure MF can learn: user u likes items
    congruent to u mod 4."""
    rng = np.random.default_rng(seed)
    rows = []
    t = 0
    for u in range(n_users):
        group = u % 4
        liked = np.arange(group, n_items, 4)
        items = rng.choice(liked, size=per_user, replace=False)
        for it in items:
            rows.append((u, int(it), 1.0, t))
            t += 1
    df = pd.DataFrame(rows, columns=[DEFAULT_USER_COL, DEFAULT_ITEM_COL, DEFAULT_RATING_COL, DEFAULT_TIMESTAMP_COL])
    return df


@pytest.fixture(scope="module")
def mf_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mfrun")
    df = make_structured_interactions()
    flagged = leave_one_out(df.copy())
    train = flagged[flagged[DEFAULT_FLAG_COL] == "train"].copy()
    valid = flagged[flagged[DEFAULT_FLAG_COL] == "validate"].copy()
    test = flagged[flagged[DEFAULT_FLAG_COL] == "test"].copy()
    sampler = AliasTable(flagged[DEFAULT_ITEM_COL].value_counts().to_dict())
    valid_neg = feed_neg_sample(valid, 20, sampler)
    test_neg = feed_neg_sample(test, 20, sampler)
    data = BaseData((train, [valid_neg], [test_neg]))

    cfg = Config(
        {
            "system": {
                "root_dir": str(tmp),
                "metrics": ["ndcg", "recall"],
                "k": [5, 10],
                "valid_metric": "ndcg",
                "valid_k": 10,
                "seed": 42,
                "result_file": "mf_test.csv",
            },
            "dataset": {"dataset": "synthetic", "data_split": "leave_one_out"},
            "model": {
                "model": "MF",
                "emb_dim": 16,
                "batch_size": 128,
                "loss": "bpr",
                "optimizer": "adam",
                "lr": 0.05,
                "reg": 0.0,
                "max_epoch": 30,
                "max_n_update": 10,
            },
        }
    )
    return cfg, data


def test_mf_bpr_end_to_end(mf_setup):
    cfg, data = mf_setup
    model = build_model(cfg.model, data.n_users, data.n_items)
    engine = TrainEngine(cfg)
    valid_cand = data.eval_candidates(data.valid[0])
    test_cand = data.eval_candidates(data.test[0])
    engine.build(model, data, valid_cand, test_cand)
    result = engine.train(verbose=False)
    # Random ranking over 21 candidates gives ndcg@10 ~= 0.20; learned >> that.
    # (Ceiling is ~0.5: the held-out positive competes with ~4 other equally
    # liked-but-unseen candidates.)
    assert result["valid_metric"] > 0.35, result
    # final test writes a results CSV
    mean_row = engine.test([test_cand], result_para={"model": "MF"})
    assert "ndcg@10" in mean_row
    import os

    assert os.path.exists(engine.result_file)
    assert os.path.exists(engine.checkpoint_dir)


def test_mf_bce_end_to_end(mf_setup):
    cfg, data = mf_setup
    cfg2 = cfg.replace(model={"loss": "bce", "num_negative": 4, "max_epoch": 20})
    model = build_model(cfg2.model, data.n_users, data.n_items)
    engine = TrainEngine(cfg2)
    valid_cand = data.eval_candidates(data.valid[0])
    engine.build(model, data, valid_cand, None)
    result = engine.train(verbose=False)
    assert result["valid_metric"] > 0.30, result


def test_checkpoint_roundtrip(mf_setup):
    cfg, data = mf_setup
    model = build_model(cfg.model, data.n_users, data.n_items)
    engine = TrainEngine(cfg)
    valid_cand = data.eval_candidates(data.valid[0])
    engine.build(model, data, valid_cand, None)
    engine.train(max_epoch=3, verbose=False)
    import jax

    before = jax.device_get(engine.params)
    engine.resume_checkpoint()
    after = jax.device_get(engine.params)
    # restored params have same structure and finite values
    assert set(before) == set(after)
    for k in before:
        assert np.all(np.isfinite(np.asarray(after[k])))


def test_resume_training_full_state(mf_setup):
    """Interrupted run resumes with optimizer state, rng, and bookkeeping.

    The reference cannot do this (state_dict only, SURVEY §5); assert the
    resumed engine continues from the saved epoch and matches the saved
    best-metric bookkeeping exactly.
    """
    import jax

    cfg, data = mf_setup
    cfg2 = cfg.replace(model={"max_epoch": 4, "max_n_update": 50})
    valid_cand = data.eval_candidates(data.valid[0])

    model = build_model(cfg2.model, data.n_users, data.n_items)
    engine = TrainEngine(cfg2)
    engine.build(model, data, valid_cand, None)
    engine.train(verbose=False)
    engine.save_checkpoint(epoch=3)  # persist state as of epoch 3 regardless of improvement
    ckpt_dir = engine.checkpoint_dir

    resumed = TrainEngine(cfg2)
    resumed.build(build_model(cfg2.model, data.n_users, data.n_items), data, valid_cand, None)
    start = resumed.resume_training(ckpt_dir)
    assert start == 4
    assert resumed.bookkeeper.best_valid_performance == engine.bookkeeper.best_valid_performance
    assert resumed.bookkeeper.n_no_update == engine.bookkeeper.n_no_update
    for k, v in jax.device_get(engine.params).items():
        np.testing.assert_allclose(np.asarray(jax.device_get(resumed.params)[k]), np.asarray(v))
    # rng restored: identical key data
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(resumed.rng)), np.asarray(jax.random.key_data(engine.rng))
    )
    # continuing 4 more epochs from restored state runs and keeps learning state sane
    result = resumed.train(max_epoch=8, verbose=False)
    assert result["valid_metric"] >= engine.bookkeeper.best_valid_performance - 1e-9


def test_orbax_checkpoint_backend(mf_setup):
    """system.checkpoint_backend="orbax" round-trips the same full state."""
    import jax

    cfg, data = mf_setup
    cfg2 = cfg.replace(
        system={"checkpoint_backend": "orbax"}, model={"max_epoch": 2, "max_n_update": 50}
    )
    valid_cand = data.eval_candidates(data.valid[0])
    engine = TrainEngine(cfg2)
    engine.build(build_model(cfg2.model, data.n_users, data.n_items), data, valid_cand, None)
    engine.train(verbose=False)
    engine.save_checkpoint(epoch=1)
    assert os.path.isdir(os.path.join(engine.checkpoint_dir, "orbax_state"))

    resumed = TrainEngine(cfg2)
    resumed.build(build_model(cfg2.model, data.n_users, data.n_items), data, valid_cand, None)
    start = resumed.resume_training(engine.checkpoint_dir)
    assert start == 2
    for k, v in jax.device_get(engine.params).items():
        np.testing.assert_allclose(np.asarray(jax.device_get(resumed.params)[k]), np.asarray(v))


def test_best_and_last_checkpoints_are_distinct(mf_setup, tmp_path):
    """ADVICE r1: resume state (last/) must not overwrite the best-model
    checkpoint, and test(use_best=True) must not mutate live params."""
    import jax

    cfg, data = mf_setup
    cfg2 = cfg.replace(system={"root_dir": str(tmp_path)}, model={"max_epoch": 6, "max_n_update": 50})
    valid_cand = data.eval_candidates(data.valid[0])
    test_cand = data.eval_candidates(data.test[0])
    engine = TrainEngine(cfg2)
    engine.build(build_model(cfg2.model, data.n_users, data.n_items), data, valid_cand, test_cand)
    engine.train(verbose=False)

    from beta_recsys_tpu.core.checkpoint import load_metadata

    best_meta = load_metadata(engine.checkpoint_dir)
    last_meta = load_metadata(os.path.join(engine.checkpoint_dir, "last"))
    assert best_meta["kind"] == "best"
    assert last_meta["kind"] == "last"
    assert best_meta["epoch"] == best_meta["best_epoch"]
    assert last_meta["epoch"] == 5  # interruption point, not best epoch

    # best params on disk are the best-epoch params; loading them must not
    # clobber the live (final-epoch) state
    live_before = jax.device_get(engine.params)
    engine.test([test_cand], use_best=True)
    live_after = jax.device_get(engine.params)
    for k in live_before:
        np.testing.assert_array_equal(np.asarray(live_before[k]), np.asarray(live_after[k]))

    # resume_training picks the last/ state (epoch 6), not the best epoch
    resumed = TrainEngine(cfg2)
    resumed.build(build_model(cfg2.model, data.n_users, data.n_items), data, valid_cand, None)
    assert resumed.resume_training(engine.checkpoint_dir) == 6
    for k, v in jax.device_get(engine.params).items():
        np.testing.assert_allclose(np.asarray(jax.device_get(resumed.params)[k]), np.asarray(v))


def test_train_after_resume_runs_full_range(mf_setup, tmp_path):
    """ADVICE r1: a fresh train() after a resumed run must not silently skip
    epochs 0..start_epoch-1 (start_epoch resets when train() completes)."""
    cfg, data = mf_setup
    cfg2 = cfg.replace(system={"root_dir": str(tmp_path)}, model={"max_epoch": 3, "max_n_update": 50})
    valid_cand = data.eval_candidates(data.valid[0])
    engine = TrainEngine(cfg2)
    engine.build(build_model(cfg2.model, data.n_users, data.n_items), data, valid_cand, None)
    engine.train(verbose=False)

    resumed = TrainEngine(cfg2)
    resumed.build(build_model(cfg2.model, data.n_users, data.n_items), data, valid_cand, None)
    assert resumed.resume_training(engine.checkpoint_dir) == 3
    resumed.train(max_epoch=5, verbose=False)  # continues 3..4
    assert resumed.start_epoch == 0  # consumed
    # a subsequent train() must start from epoch 0 again (full range)
    epochs_run = []
    orig = resumed.epoch_fn

    def counting_epoch_fn(params, opt_state, rng):
        epochs_run.append(1)
        return orig(params, opt_state, rng)

    resumed.epoch_fn = counting_epoch_fn
    resumed.train(max_epoch=2, verbose=False)
    assert len(epochs_run) == 2


def test_checkpoint_backend_mtime_autodetect(tmp_path):
    """When both flax and orbax artifacts exist, the newer one wins."""
    import time as _time

    import jax

    from beta_recsys_tpu.core.checkpoint import load_checkpoint, save_checkpoint

    ckpt = str(tmp_path / "ck")
    state_old = {"w": np.full((3,), 1.0, np.float32)}
    state_new = {"w": np.full((3,), 2.0, np.float32)}
    save_checkpoint(ckpt, state_old, backend="flax")
    _time.sleep(0.05)
    save_checkpoint(ckpt, state_new, backend="orbax")
    got = load_checkpoint(ckpt, {"w": np.zeros((3,), np.float32)})
    np.testing.assert_allclose(np.asarray(got["w"]), 2.0)
    # flip: now flax is newer
    _time.sleep(0.05)
    save_checkpoint(ckpt, {"w": np.full((3,), 3.0, np.float32)}, backend="flax")
    got = load_checkpoint(ckpt, {"w": np.zeros((3,), np.float32)})
    np.testing.assert_allclose(np.asarray(got["w"]), 3.0)
