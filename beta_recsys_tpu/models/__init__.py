"""Model zoo registry.

Each model is a :class:`~beta_recsys_tpu.models.base.RecModel` subclass — a pure
functional (init_params / score / loss) family over a params pytree. The
registry maps reference model names (configs/*.json "model" keys) to classes.
"""

from .base import RecModel  # noqa: F401
from .gmf import GMF
from .lightgcn import LightGCN
from .mf import MF
from .mlp import MLP
from .ncf import NeuMF
from .ngcf import NGCF
from .sasrec import SASRec

MODEL_REGISTRY = {
    "MF": MF,
    "mf": MF,
    "GMF": GMF,
    "MLP": MLP,
    "NCF": NeuMF,
    "NeuMF": NeuMF,
    "ncf": NeuMF,
    "LightGCN": LightGCN,
    "lightgcn": LightGCN,
    "NGCF": NGCF,
    "ngcf": NGCF,
    "SASRec": SASRec,
    "sasrec": SASRec,
}


def register_model(name, cls):
    MODEL_REGISTRY[name] = cls


def build_model(model_cfg, n_users, n_items, artifacts=None):
    """Construct a model from a model-section config by its "model" name."""
    name = model_cfg.get("model")
    if name not in MODEL_REGISTRY:
        raise KeyError(f"Unknown model {name!r}; known: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name](model_cfg, n_users, n_items, artifacts)
