"""Diagnose the LightGCN parity-curve decline (VERDICT r3 weak #2).

Sweeps lr x adjacency-normalization on the structured-synthetic split and
prints each run's valid ndcg@10 curve. The r3 curve (lr=0.05) fell
monotonically 0.148 -> 0.099; the LightGCN paper trains with Adam at 1e-3.
"""

import sys
import time

sys.path.insert(0, ".")

import examples.parity_check as pc


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    max_epoch = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    split = pc.load_dataset("synthetic_structured", 1, 100, "parity_runs")
    for lr in (0.05, 0.005, 0.001):
        for keep_pro in (0.6, 1.0):
            pc.MODEL_SPECS["LightGCN"]["overrides"] = {
                "lr": lr, "keep_pro": keep_pro, "max_epoch": max_epoch,
                "max_n_update": max_epoch,
            }
            t0 = time.time()
            r = pc.run_one("LightGCN", split, 0, 1, "synthetic_structured",
                           "parity_runs")
            curve = " ".join(f"{c['epoch']}:{c['ndcg@10']:.3f}" for c in r["curve"])
            print(f"lr={lr} keep_pro={keep_pro} best_ep={r['best_epoch']} "
                  f"test={r['test'].get('ndcg@10'):.4f} ({time.time()-t0:.0f}s)\n"
                  f"  {curve}", flush=True)


if __name__ == "__main__":
    main()
