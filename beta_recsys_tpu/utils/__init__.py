"""Utility layer: constants, host helpers, samplers, metrics, logging, monitoring."""

from . import constants  # noqa: F401
from .alias_table import AliasTable  # noqa: F401
from .common import (  # noqa: F401
    ensure_dir,
    get_dataframe_from_npz,
    save_dataframe_as_npz,
    set_seed,
    str2bool,
    timeit,
    update_args,
)
from .monitor import Monitor  # noqa: F401
from .unigram_table import UnigramTable  # noqa: F401
