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
