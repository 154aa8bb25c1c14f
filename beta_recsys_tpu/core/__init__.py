"""Training/evaluation core: engines, checkpointing, user-facing Recommender."""

from .eval_engine import EvalBookkeeper, FullCatalogEvaluator, RankingEvaluator  # noqa: F401
from .rating_eval import RatingEvaluator  # noqa: F401
from .train_engine import TrainEngine, make_epoch_fn, make_negative_sampler, make_optimizer  # noqa: F401
