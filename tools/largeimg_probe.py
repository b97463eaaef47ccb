"""Isolate the 1792^2 LargeImg TPU worker crash (dev tool).

The round-5 pipeline's `--large-img` run at 1792^2/r4 (ViT-B/16 backbone,
28^2 features, ratio-64 NAF upsample) crashed the TPU worker in both dtypes
("TPU worker process crashed or restarted ... kernel fault"). At that
config neither fused attention kernel applies, so the suspects are the
fused Pallas encoder at 1792^2 and the XLA oracle NA at ratio 64.

Each stage runs in its OWN subprocess (a worker crash poisons the process,
CLAUDE.md), so one faulting stage doesn't mask the verdict on the rest.

Run: python tools/largeimg_probe.py [stage]
  no arg: drive all stages via subprocesses and print a verdict table
  stage arg (encoder|backbone|attention|model): run that stage inline
"""

import json
import subprocess
import sys

sys.path.insert(0, ".")

STAGES = ["backbone", "encoder", "attention", "model"]


def run_stage(stage: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/naf_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from naf_tpu.utils import device_time_ms

    dtype = jnp.bfloat16
    size = 1792
    rng = np.random.RandomState(0)

    if stage == "backbone":
        from naf_tpu.backbones import PretrainedViTWrapper

        bb = PretrainedViTWrapper("vit_base_patch16_224.dino", dtype=dtype)
        small = jnp.asarray(rng.randn(1, size // 4, size // 4, 3), dtype)
        ms = device_time_ms(
            lambda p, x: bb.model.apply({"params": p}, x), bb.params, small,
            iters=2,
        )
        print(json.dumps({"stage": stage, "ms": round(ms, 2)}))
        return

    from naf_tpu.api import load_naf_params

    model, params = load_naf_params()
    params = jax.tree.map(lambda a: a.astype(dtype), params)
    image = jnp.asarray(rng.randn(1, size, size, 3), dtype)

    if stage == "encoder":
        enc = model.bind({"params": params}).image_encoder
        ms = device_time_ms(
            lambda im: enc.encode_guarded(im, (size, size)), image, iters=2
        )
        print(json.dumps({"stage": stage, "ms": round(ms, 2)}))
        return

    feats = jnp.asarray(rng.randn(1, 28, 28, 768), dtype)
    if stage == "attention":
        # Bind INSIDE the traced function: a module bound outside and reused
        # across traces caches RoPE tables from the first trace in setup()
        # and leaks those tracers into the next (UnexpectedTracerError).
        def attn(p, im, ft):
            bound = model.bind({"params": p})
            x = bound.image_encoder(im, (size, size))
            from naf_tpu.ops.pool import adaptive_avg_pool2d

            keys = adaptive_avg_pool2d(x, ft.shape[1:3])
            return bound.upsampler(x, keys, ft)

        ms = device_time_ms(attn, params, image, feats, iters=2)
        print(json.dumps({"stage": stage, "ms": round(ms, 2)}))
        return

    if stage == "model":
        ms = device_time_ms(
            lambda p, im, ft: model.apply({"params": p}, im, ft, (size, size)),
            params, image, feats, iters=2,
        )
        print(json.dumps({"stage": stage, "ms": round(ms, 2)}))
        return

    raise SystemExit(f"unknown stage {stage}")


def main() -> None:
    if len(sys.argv) > 1:
        run_stage(sys.argv[1])
        return
    results = {}
    for stage in STAGES:
        proc = subprocess.run(
            [sys.executable, __file__, stage],
            capture_output=True, text=True, timeout=1500,
        )
        ok = proc.returncode == 0
        tail = (proc.stdout + proc.stderr).strip().splitlines()
        results[stage] = {
            "ok": ok,
            "detail": tail[-1][:200] if tail else "",
        }
        print(f"{stage}: {'OK' if ok else 'CRASH/FAIL'} {results[stage]['detail']}",
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
