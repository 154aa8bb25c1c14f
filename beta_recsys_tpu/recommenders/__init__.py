"""User-facing recommender wrappers, one per model family.

Mirrors the reference export surface (beta_rec/recommenders/__init__.py:1-24).
Each wrapper wires the right data class and derived artifacts; all heavy
lifting is the generic Recommender + TrainEngine.
"""

from ..core.recommender import Recommender
from ..data.grocery_data import GroceryData
from ..data.sequential_data import SequentialData


class MatrixFactorization(Recommender):
    """MF with BPR/BCE (reference recommenders/matrix_factorization.py)."""

    model_name = "MF"


class GMFRecommender(Recommender):
    model_name = "GMF"


class MLPRecommender(Recommender):
    model_name = "MLP"


class NeuCF(Recommender):
    """NeuMF, optionally warm-started from pretrained GMF/MLP checkpoints."""

    model_name = "NCF"

    def __init__(self, config, gmf_params=None, mlp_params=None):
        super().__init__(config)
        self._pretrained = {"gmf_params": gmf_params, "mlp_params": mlp_params}

    def build_artifacts(self, data):
        return {k: v for k, v in self._pretrained.items() if v is not None}


class LightGCN(Recommender):
    """LightGCN over the normalized interaction graph
    (reference recommenders/lightgcn.py builds norm_adj host-side).

    ``adj_variant`` in the model config picks the normalization: "sym"
    (paper-style, default) or "row_selfloop" (the reference's exact
    D^-1(A+I)). Head-to-head on structured synthetic both peak at epoch ~0;
    see PARITY_RESULTS.md."""

    model_name = "LightGCN"

    def build_artifacts(self, data):
        return {"adj": data.get_norm_adj(self.config.model.get("adj_variant", "sym"))}


class NGCF(Recommender):
    model_name = "NGCF"

    def build_artifacts(self, data):
        return {"adj": data.get_norm_adj("row")}


class SASRec(Recommender):
    """SASRec sequential recommender (reference recommenders/sasrec.py).

    Final-test scoring extends every user's context with their validation
    items (reference eval_engine.test_seq_predict:319-375) via test_model().
    """

    model_name = "SASRec"
    data_class = SequentialData

    def build_artifacts(self, data):
        maxlen = int(self.config.model.get("maxlen", 200))
        return {"ctx": data.eval_context(maxlen)}

    def test_model(self):
        maxlen = int(self.config.model.get("maxlen", 200))
        test_ctx = self.data.eval_context(maxlen, extra_df=self.data.valid[0])
        return self.model.with_context(test_ctx)


class PairwiseGMFRecommender(Recommender):
    """PairwiseGMF — typically used to pretrain CMN memories."""

    model_name = "PairwiseGMF"


class SimGCL(Recommender):
    model_name = "SimGCL"

    def build_artifacts(self, data):
        return {"adj": data.get_norm_adj("sym")}


class BUIR(Recommender):
    model_name = "BUIR"

    def build_artifacts(self, data):
        return {"adj": data.get_norm_adj("sym")}


class UltraGCN(Recommender):
    """UltraGCN with host-precomputed constraint and item-item matrices."""

    model_name = "UltraGCN"

    def build_artifacts(self, data):
        from ..ops.ultragcn_prep import get_ii_constraint_mat

        train_mat, beta_uD, beta_iD = data.create_constraint_mat()
        k = int(self.config.model.get("ii_neighbor_num", 10))
        nb, sims = get_ii_constraint_mat(train_mat, k)
        return {
            "constraint": (beta_uD, beta_iD),
            "ii_neighbors": nb,
            "ii_sims": sims,
        }


class VAECF(Recommender):
    model_name = "VAECF"

    def build_artifacts(self, data):
        import numpy as np

        rows = np.asarray(data.user_item_csr().todense(), dtype=np.float32)
        return {"user_rows": (rows > 0).astype(np.float32)}


class Triple2vec(Recommender):
    model_name = "Triple2vec"
    data_class = GroceryData


class UserKNNRecommender(Recommender):
    model_name = "UserKNN"

    def build_artifacts(self, data):
        return {"interactions": data.user_item_csr()}


class ItemKNNRecommender(Recommender):
    model_name = "ItemKNN"

    def build_artifacts(self, data):
        return {"interactions": data.user_item_csr()}


# Reference class names (beta_rec/recommenders/userKNN.py, itemKNN.py).
UserKNN = UserKNNRecommender
ItemKNN = ItemKNNRecommender


class SGL(Recommender):
    model_name = "SGL"

    def build_artifacts(self, data):
        return {"adj": data.get_norm_adj("sym")}


class MixGCF(Recommender):
    model_name = "MixGCF"

    def build_artifacts(self, data):
        return {"adj": data.get_norm_adj("sym")}


class LCFN(Recommender):
    """LCFN: needs one-off host-side hypergraph eigendecomposition."""

    model_name = "LCFN"

    def build_artifacts(self, data):
        cut_off = float(self.config.model.get("cut_off", 0.2))
        return {"graph_embeddings": data.get_graph_embeddings(cut_off)}


class NARM(Recommender):
    model_name = "NARM"
    data_class = SequentialData

    def build_artifacts(self, data):
        maxlen = int(self.config.model.get("maxlen", 19))
        return {"ctx": data.eval_context(maxlen)}

    def test_model(self):
        maxlen = int(self.config.model.get("maxlen", 19))
        test_ctx = self.data.eval_context(maxlen, extra_df=self.data.valid[0])
        return self.model.with_context(test_ctx)


class TiSASRec(Recommender):
    model_name = "TiSASRec"
    data_class = SequentialData

    def build_artifacts(self, data):
        maxlen = int(self.config.model.get("maxlen", 50))
        time_span = int(self.config.model.get("time_span", 256))
        ctx, ctx_time = data.tisasrec_eval_context(maxlen, time_span)
        return {"ctx": ctx, "ctx_time": ctx_time}

    def test_model(self):
        maxlen = int(self.config.model.get("maxlen", 50))
        time_span = int(self.config.model.get("time_span", 256))
        ctx, ctx_time = self.data.tisasrec_eval_context(
            maxlen, time_span, extra_df=self.data.valid[0]
        )
        return self.model.with_context(ctx, ctx_time)


class CMN(Recommender):
    """CMN, optionally warm-started from PairwiseGMF embeddings."""

    model_name = "CMN"

    def __init__(self, config, user_embeddings=None, item_embeddings=None):
        super().__init__(config)
        self._pretrained = {
            "user_embeddings": user_embeddings,
            "item_embeddings": item_embeddings,
        }

    def build_artifacts(self, data):
        from ..models.cmn import build_item_neighborhoods

        nb, nb_len = build_item_neighborhoods(data.user_item_csr())
        art = {"item_neighbors": nb, "item_nb_len": nb_len}
        art.update({k: v for k, v in self._pretrained.items() if v is not None})
        return art


class VBCAR(Recommender):
    model_name = "VBCAR"
    data_class = GroceryData

    def build_artifacts(self, data):
        user_fea, item_fea = data.user_item_features(
            fea_type=self.config.model.get("item_fea_type", "random"),
            emb_dim=int(self.config.model.get("late_dim", 128)),
        )
        return {"user_fea": user_fea, "item_fea": item_fea}


class TVBR(VBCAR):
    model_name = "TVBR"


__all__ = [
    "Recommender",
    "MatrixFactorization",
    "GMFRecommender",
    "MLPRecommender",
    "NeuCF",
    "LightGCN",
    "NGCF",
    "SASRec",
    "SimGCL",
    "BUIR",
    "UltraGCN",
    "VAECF",
    "Triple2vec",
    "UserKNNRecommender",
    "ItemKNNRecommender",
    "UserKNN",
    "ItemKNN",
    "SGL",
    "MixGCF",
    "LCFN",
    "NARM",
    "TiSASRec",
    "CMN",
    "VBCAR",
    "TVBR",
    "PairwiseGMFRecommender",
]
