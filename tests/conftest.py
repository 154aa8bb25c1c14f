"""Test configuration: force JAX onto 8 virtual CPU devices.

Multi-chip sharding tests run against this virtual mesh, the TPU answer to
testing multi-node behavior without a real cluster (SURVEY.md §4). The config
override (not env vars) is required because the environment's sitecustomize
imports jax and registers a TPU backend before conftest runs.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pytest

# ---------------------------------------------------------------------------
# Two-tier suite (VERDICT r3 #10): `make test-fast` (-m "not slow") gives a
# <2-minute iteration signal — imports, shapes, metric goldens, split goldens,
# dispatch, sharding primitives; the full suite (training loops, per-model
# learning bars, CLI smoke, interpret-mode ring collectives) stays in CI.
# Modules are tiered by measured duration (pytest --durations, r4).
# ---------------------------------------------------------------------------

SLOW_MODULES = {
    "test_examples_cli",         # subprocess CLI smoke: ~4 min
    "test_all_wrappers",         # 25 wrapper end-to-end trainings
    "test_ring_exchange",        # interpret-mode Pallas ring: ~1 min
    "test_sharded_sparse",       # multi-mesh epoch parity: ~2 min
    "test_models_wave2",         # per-model learning bars
    "test_models_wave3",
    "test_model_learning",
    "test_graph_models_learning",
    "test_seq_models_learning",
    "test_tune_process_mode",    # spawns worker processes
    "test_rowadam_kernel",       # interpret-mode Pallas row-Adam
    "test_mixed_precision",      # bf16 vs fp32 epochs
    "test_recommender_api",      # experiment matrix + tune grid
    "test_bucketed_gather",
    "test_ncf_pretrain",
    "test_flash_attention",
    "test_notebooks",            # nbclient end-to-end execution: ~2 min
}

SLOW_TESTS = {
    "test_dryrun_multichip",     # full graft-entry stack: ~50 s
    "test_sasrec_learns_next_item",
    "test_bucketed_overflow_counter",
    "test_engine_wires_mesh_into_evaluators",
    "test_alt_row_update_matches_xla_epoch",
    "test_graph_models",
    "test_load_pretrained_model_runs_no_training",
    "test_engine_with_mesh_config",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        module = item.module.__name__.rsplit(".", 1)[-1]
        if module in SLOW_MODULES or item.name.split("[")[0] in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
