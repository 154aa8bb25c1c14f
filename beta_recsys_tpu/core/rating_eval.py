"""Rating-prediction evaluation (explicit feedback): rmse / mae / r2 / auc.

Reference parity: EvalEngine's metric dispatch includes rating metrics
(beta_rec/core/eval_engine.py:49-87 — rmse/mae/rsquared) for explicit-feedback
datasets. Here the (user, item, rating) triples of an evaluation frame are
scored in one jitted call and reduced on device
(beta_recsys_tpu.ops.metrics rating reductions).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import metrics as device_metrics
from ..utils.constants import DEFAULT_ITEM_COL, DEFAULT_RATING_COL, DEFAULT_USER_COL

_RATING_FNS = {
    "rmse": device_metrics.rmse,
    "mae": device_metrics.mae,
    "rsquared": device_metrics.rsquared,
    "exp_var": device_metrics.exp_var,
    "auc": device_metrics.auc,
    "logloss": device_metrics.logloss,
}


class RatingEvaluator:
    """Jitted pointwise evaluation over explicit (user, item, rating) triples."""

    def __init__(self, model, eval_df, metrics=("rmse", "mae")):
        unknown = [m for m in metrics if m not in _RATING_FNS]
        if unknown:
            raise ValueError(f"Unknown rating metrics {unknown}; known: {sorted(_RATING_FNS)}")
        self.model = model
        self.metrics = tuple(metrics)
        self.users = jnp.asarray(eval_df[DEFAULT_USER_COL].to_numpy(np.int32))
        self.items = jnp.asarray(eval_df[DEFAULT_ITEM_COL].to_numpy(np.int32))
        self.ratings = jnp.asarray(eval_df[DEFAULT_RATING_COL].to_numpy(np.float32))

        def _eval(params):
            preds = model.score_pairs(params, self.users, self.items)
            return {m: _RATING_FNS[m](self.ratings, preds) for m in self.metrics}

        self._eval = jax.jit(_eval)

    def evaluate(self, params):
        import jax

        # one device_get for all scalars (avoids a roundtrip per metric)
        return {k: float(v) for k, v in jax.device_get(self._eval(params)).items()}
