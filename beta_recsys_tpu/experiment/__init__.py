"""Experiment matrix + hyperparameter sweep runners."""

from .experiment import Experiment  # noqa: F401
from .tune import expand_grid, tune  # noqa: F401
