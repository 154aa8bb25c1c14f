"""In-memory data layer producing device-ready arrays."""

from .base_data import BaseData, EvalCandidates, TrainArrays  # noqa: F401
