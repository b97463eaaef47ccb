"""Device-measured peak HBM for headline bench rows (VERDICT r3 item 8).

The sweep's `fwd_mem_mb`/`bwd_mem_mb` columns are XLA `memory_analysis()`
of the compiled executable (argument + temp + output sizes) — analytical,
not runtime. This probe grounds them with a device-side measurement:
`device.memory_stats()['peak_bytes_in_use']` deltas around the real
execution (the reference's comparable number is torch
`max_memory_allocated`, test/test_utils.py).

For each headline config it records
  {analytical fwd/bwd (for cross-checking), measured fwd/bwd peak MB}
and merges a `fwd_mem_measured_mb` / `bwd_mem_measured_mb` pair onto the
matching rows of benchmarks/results.json.

Run: python tools/measure_mem.py   (on the real TPU)
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/naf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

CONFIGS = [
    # (model, img, embed, lr)  — headline rows: r16 and r32 for NAF + JAFAR
    ("NAF", 448, 384, 28),
    ("NAF", 896, 384, 28),
    ("JAFAR", 448, 384, 28),
    ("JAFAR", 896, 384, 28),
]


def peak_mb(dev) -> float:
    stats = dev.memory_stats()
    return stats["peak_bytes_in_use"] / 2**20


def main():
    from naf_tpu.models.registry import ModelWrapper

    dev = jax.devices()[0]
    if not hasattr(dev, "memory_stats") or dev.memory_stats() is None:
        print("device.memory_stats() unavailable on this backend")
        return

    out = {}
    dtype = jnp.bfloat16
    for name, img, embed, lr in CONFIGS:
      try:
        # fresh baseline per config: free executables + buffers
        jax.clear_caches()
        wrapper = ModelWrapper(
            name, embed_dim=embed, ratio=img // lr,
            init_shapes=((1, img, img, 3), (1, lr, lr, embed), (img, img)),
        )
        model = wrapper.model
        params = jax.tree.map(lambda a: a.astype(dtype), wrapper.params)
        key = jax.random.PRNGKey(0)
        image = jax.random.normal(key, (1, img, img, 3), dtype)
        feats = jax.random.normal(key, (1, lr, lr, embed), dtype)

        def fwd(p, im, ft):
            return model.apply({"params": p}, im, ft, (img, img))

        fj = jax.jit(fwd)
        base = peak_mb(dev)
        o = fj(params, image, feats)
        jax.block_until_ready(o)  # harmless if tunnel ignores it
        float(jnp.sum(o.astype(jnp.float32)))  # force completion via fetch
        peak_f = peak_mb(dev)

        def loss(p, im, ft):
            return jnp.sum(fwd(p, im, ft).astype(jnp.float32) ** 2)

        gj = jax.jit(jax.grad(loss))
        del o
        g = gj(params, image, feats)
        for leaf in jax.tree_util.tree_leaves(g):
            float(jnp.sum(leaf.astype(jnp.float32)))
            break  # one fetch serializes enough; peak already hit
        peak_b = peak_mb(dev)

        row = {
            "fwd_peak_mb": round(peak_f - base, 1),
            "bwd_peak_mb": round(peak_b - base, 1),
            "baseline_mb": round(base, 1),
        }
        out[f"{name}_{img}_{embed}_{lr}"] = row
        print(name, img, row, flush=True)
        del g, params, image, feats
      except Exception as e:  # e.g. JAFAR r32 exceeds one v5e's HBM
        print(f"{name} {img}: {type(e).__name__}: {str(e)[:160]}", flush=True)
        out[f"{name}_{img}_{embed}_{lr}"] = {"error": str(e)[:160]}

    # merge onto results.json rows
    path = "benchmarks/results.json"
    rows = json.load(open(path))
    for name, img, embed, lr in CONFIGS:
        r = out[f"{name}_{img}_{embed}_{lr}"]
        if "fwd_peak_mb" not in r:
            continue
        for row in rows:
            if (row.get("model") == name and row.get("img_size") == img
                    and row.get("embed_dim") == embed
                    and row.get("lr_size") == lr
                    and row.get("dtype") == "bfloat16"):
                row["fwd_mem_measured_mb"] = r["fwd_peak_mb"]
                row["bwd_mem_measured_mb"] = r["bwd_peak_mb"]
    with open(path, "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
