"""beta_recsys_tpu — a TPU-native recommender-systems framework.

Built from scratch on JAX/XLA (jit, pjit/shard_map, Pallas) with the full
capability surface of Beta-RecSys (reference study in SURVEY.md): unified
dataset download→filter→split→negative-sampling pipeline, config-driven
train/eval engines with early stopping and checkpointing, a model zoo spanning
factorization, graph, sequential, basket and VAE recommenders, hyperparameter
sweeps, and data-parallel + row-sharded-embedding scaling across device meshes.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("BETA_RECSYS_FORCE_CPU"):
    # Escape hatch for CI/subprocess smoke tests in environments whose
    # sitecustomize pre-registers a TPU backend (env vars are too late there;
    # only the config API works).
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
