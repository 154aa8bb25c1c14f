"""Model zoo registry.

Each model is a :class:`~beta_recsys_tpu.models.base.RecModel` subclass — a pure
functional (init_params / score / loss) family over a params pytree. The
registry maps reference model names (configs/*.json "model" keys) to classes.
"""

from .base import RecModel  # noqa: F401
from .buir import BUIR
from .cmn import CMN
from .lcfn import LCFN
from .mixgcf import MixGCF
from .narm import NARM
from .sgl import SGL
from .tisasrec import TiSASRec
from .tvbr import TVBR
from .vbcar import VBCAR
from .gmf import GMF
from .knn import ItemKNN, UserKNN
from .lightgcn import LightGCN
from .mf import MF
from .mlp import MLP
from .ncf import NeuMF
from .ngcf import NGCF
from .pairwise_gmf import PairwiseGMF
from .sasrec import SASRec
from .simgcl import SimGCL
from .triple2vec import Triple2vec
from .ultragcn import UltraGCN
from .vaecf import VAECF

MODEL_REGISTRY = {
    "MF": MF,
    "mf": MF,
    "GMF": GMF,
    "MLP": MLP,
    "NCF": NeuMF,
    "NeuMF": NeuMF,
    "ncf": NeuMF,
    "PairwiseGMF": PairwiseGMF,
    "LightGCN": LightGCN,
    "lightgcn": LightGCN,
    "NGCF": NGCF,
    "ngcf": NGCF,
    "SASRec": SASRec,
    "sasrec": SASRec,
    "SimGCL": SimGCL,
    "simgcl": SimGCL,
    "BUIR": BUIR,
    "buir": BUIR,
    "UltraGCN": UltraGCN,
    "ultragcn": UltraGCN,
    "VAECF": VAECF,
    "vaecf": VAECF,
    "Triple2vec": Triple2vec,
    "triple2vec": Triple2vec,
    "UserKNN": UserKNN,
    "userKNN": UserKNN,
    "ItemKNN": ItemKNN,
    "itemKNN": ItemKNN,
    "SGL": SGL,
    "sgl": SGL,
    "MixGCF": MixGCF,
    "mixgcf": MixGCF,
    "LCFN": LCFN,
    "lcfn": LCFN,
    "NARM": NARM,
    "narm": NARM,
    "TiSASRec": TiSASRec,
    "tisasrec": TiSASRec,
    "CMN": CMN,
    "cmn": CMN,
    "VBCAR": VBCAR,
    "vbcar": VBCAR,
    "TVBR": TVBR,
    "tvbr": TVBR,
}


def register_model(name, cls):
    MODEL_REGISTRY[name] = cls


def build_model(model_cfg, n_users, n_items, artifacts=None):
    """Construct a model from a model-section config by its "model" name."""
    name = model_cfg.get("model")
    if name not in MODEL_REGISTRY:
        raise KeyError(f"Unknown model {name!r}; known: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name](model_cfg, n_users, n_items, artifacts)
