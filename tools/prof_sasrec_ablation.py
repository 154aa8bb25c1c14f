"""SASRec production-shape epoch ablation (VERDICT r4 #6).

sasrec_production_50k_users runs at 1.4% MXU; this decomposes where the step
time actually goes by stubbing one component at a time (module-level
monkeypatch of the ops the model calls) and re-timing the SAME production
epoch (50k users, maxlen 200, B=512, d=64, 2 blocks):

  full          — baseline
  no_dropout    — dropout_rate=0 (3 inverted-dropout sites/block + input)
  no_attention  — causal_mha -> identity(q)
  no_ffn        — pointwise_ffn -> identity
  no_ln         — layer_norm -> identity (5 LN sites)
  no_lookup     — table_lookup -> zeros (removes gather + one-hot/scatter VJP)
  emb_only      — no blocks at all (lookup + pos emb + final LN + loss)
  no_sampling   — bitmask rejection sampler -> uniform draw

The difference full - no_X is the (fusion-entangled, so approximate) cost of
component X; emb_only is the floor of the non-transformer scaffolding.
"""

import json
import sys

sys.path.insert(0, ".")


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    import bench
    import beta_recsys_tpu.models.sasrec as sas_mod

    orig = {
        "causal_mha": sas_mod.causal_mha,
        "pointwise_ffn": sas_mod.pointwise_ffn,
        "layer_norm": sas_mod.layer_norm,
        "inverted_dropout": sas_mod.inverted_dropout,
        "table_lookup": sas_mod.table_lookup,
    }

    def run(label, dropout=0.1):
        variants = ((label, None, "auto"),)
        out, _ = bench.bench_sasrec_production(variants=variants)
        return out[label][1]  # epoch seconds

    def restore():
        for k, v in orig.items():
            setattr(sas_mod, k, v)

    results = {}

    def record(label, fn=None, **patches):
        restore()
        for k, v in patches.items():
            setattr(sas_mod, k, v)
        try:
            t = run(label)
            results[label] = {"epoch_sec": t}
        except Exception as e:
            results[label] = {"error": repr(e)[:200]}
        print(label, json.dumps(results[label]), flush=True)
        with open("parity_runs/prof_sasrec_ablation.json", "w") as f:
            json.dump(results, f, indent=2)  # flush per variant: timeouts
            # must not lose finished measurements

    record("full")
    record("no_attention",
           causal_mha=lambda q, k, v, h, wq, wk, wv, wo, **kw: q)
    record("no_ffn", pointwise_ffn=lambda x, p, dr, rng: x)
    record("no_ln", layer_norm=lambda x, scale, bias: x)
    record("no_dropout", inverted_dropout=lambda rng, x, rate: x)
    record("no_lookup",
           table_lookup=lambda t, ids: jnp.zeros(ids.shape + (t.shape[-1],), t.dtype))
    record("emb_only",
           causal_mha=lambda q, k, v, h, wq, wk, wv, wo, **kw: q,
           pointwise_ffn=lambda x, p, dr, rng: x,
           layer_norm=lambda x, scale, bias: x)
    restore()

    # sampling cost: uniform draw instead of bitmask rejection
    import beta_recsys_tpu.core.train_engine as te
    from beta_recsys_tpu.ops.sampling import uniform_negatives

    orig_sampler = te.make_negative_sampler
    te.make_negative_sampler = lambda data, mode="auto": (
        lambda rng, users, shape: uniform_negatives(rng, shape, data.n_items))
    try:
        t = run("no_sampling")
        results["no_sampling"] = {"epoch_sec": t}
    except Exception as e:
        results["no_sampling"] = {"error": repr(e)[:200]}
    finally:
        te.make_negative_sampler = orig_sampler
    print("no_sampling", json.dumps(results["no_sampling"]), flush=True)

    base = results.get("full", {}).get("epoch_sec")
    if base:
        for k, v in results.items():
            if "epoch_sec" in v and k != "full":
                v["share_of_full"] = round(1 - v["epoch_sec"] / base, 3)
    with open("parity_runs/prof_sasrec_ablation.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
