"""Benchmark entry point — prints ONE JSON line for the driver.

Headline metric: NAF forward FPS at 448x448 output (lr 28x28, embed dim 384,
ratio 16) — the reference's default benchmark config (test/test_utils.py:16-25),
where the A100-40GB reference measures 56.24 ms => 17.78 FPS
(test/test_results.json:243-256). vs_baseline is our FPS / reference FPS.

Extra fields:
- fps_2048_r16: 2048^2 image -> 2048^2 output (encoder at full output res).
- fps_448to2048_r16: 448^2 image -> 2048^2 output (the reference's LargeImg
  regime, test/test_results.json:553-579: upsampling dominates, encoder
  cheap). The README's ~18 FPS "intermediate resolution" figure and the
  >=3x north star refer to this kind of 2K output.
- bwd_ms_448_r16: backward+SGD step at the default config (1x1 head, the
  reference's backward benchmark shape, test/backward_speed.py:33-62;
  A100 measures 163.08 ms).
- na_kernel_ms_448: bare fused cross-scale NA kernel at the default config.

Timing methodology: naf_tpu.utils.benchmarking.device_time_ms — N chained
on-device executions in one scan, every input perturbed by a data-dependent
additive epsilon, full-output reduction as the chain. This is robust against
XLA constant-folding / hoisting / dot-slicing, which silently inflated
naive loop timings by up to 3x (see the module docstring). Round-1 numbers
recorded with the old harness were optimistic; these are honest.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compile cache: axon remote compiles take minutes per new
# kernel; repeated bench invocations in one round must not re-pay them.
jax.config.update("jax_compilation_cache_dir", "/tmp/naf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _timeit(fn, *args, iters=15, chain="full"):
    """Per-call seconds via chained on-device loop (tunnel-safe, fold-safe).

    chain="scalar" is used for the forward metrics, whose outputs come
    straight out of a Pallas kernel: XLA cannot slice through the opaque
    custom call, so a single-element carry serializes iterations without the
    full-output read the default chain pays (~4.3 ms/iter at 2048^2x384 —
    a verification tax the reference's CUDA-event timing,
    test/forward_speed.py:39-50, does not have). Hazard-checked in
    naf_tpu/utils/benchmarking.py: on an XLA-native dot the scalar chain
    undercounts 18x (5.8 -> 0.32 ms), on the kernel-terminated forward it
    removes exactly the reduce cost (20.3 -> 16.0 ms at 448^2->2048^2)."""
    from naf_tpu.utils import device_time_ms

    return device_time_ms(fn, *args, iters=iters, chain=chain) / 1e3


def main():
    from naf_tpu.api import load_naf_params
    from naf_tpu.kernels.na2d_fused import cross_scale_na2d_fused

    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)

    model, params = load_naf_params()  # reference defaults: dim 256, k 9
    params = jax.tree.map(lambda x: x.astype(dtype), params)

    def fwd(params, image, feats, out_hw):
        return model.apply({"params": params}, image, feats, out_hw)

    results = {}

    # Headline: 448^2 out, 28^2 lr, dim 384 (reference default sweep point).
    image = jnp.asarray(rng.randn(1, 448, 448, 3), dtype)
    feats = jnp.asarray(rng.randn(1, 28, 28, 384), dtype)
    f = lambda p, im, ft: fwd(p, im, ft, (448, 448))
    t448 = _timeit(f, params, image, feats, chain="scalar")
    results["fps_448"] = 1.0 / t448

    # Backward at the same config: 1x1 head + SGD step, the reference's
    # backward benchmark shape (test/backward_speed.py:33-62; A100 163.08 ms)
    head = jnp.asarray(rng.randn(384, 384) * 0.01, dtype)

    def train_step(params, head, image, feats):
        def loss_fn(p, h):
            out = fwd(p, image, feats, (448, 448))
            return jnp.mean((out @ h) ** 2)

        gp, gh = jax.grad(loss_fn, argnums=(0, 1))(params, head)
        params = jax.tree.map(lambda p, g: p - 1e-3 * g, params, gp)
        return params, head - 1e-3 * gh

    results["bwd_ms_448"] = _timeit(train_step, params, head, image, feats) * 1e3

    # Max-size: 2048^2 out from 128^2 lr (ratio 16), 2048^2 input image.
    image2 = jnp.asarray(rng.randn(1, 2048, 2048, 3), dtype)
    feats2 = jnp.asarray(rng.randn(1, 128, 128, 384), dtype)
    f2 = lambda p, im, ft: fwd(p, im, ft, (2048, 2048))
    t2048 = _timeit(f2, params, image2, feats2, iters=6, chain="scalar")
    results["fps_2048"] = 1.0 / t2048

    # Upsampling regime: small image, 2K output (encoder cheap).
    f3 = lambda p, im, ft: fwd(p, im, ft, (2048, 2048))
    t448to2048 = _timeit(f3, params, image, feats2, iters=6, chain="scalar")
    results["fps_448to2048"] = 1.0 / t448to2048

    # Bare fused NA kernel at the default config. NOTE: this standalone
    # number includes the K/V union-tile build AND pays tile-padded HBM
    # layouts for the 5-D (B,H,W,n,d) inputs that the in-context model path
    # avoids (its q arrives as a flat-NHWC bitcast) — so it is an upper
    # bound on the kernel's in-model cost, not the same quantity as the
    # per-stage attention figure in docs/PERF.md.
    q = jnp.asarray(rng.randn(1, 448, 448, 4, 64), dtype)
    k = jnp.asarray(rng.randn(1, 28, 28, 4, 64), dtype)
    v = jnp.asarray(rng.randn(1, 28, 28, 4, 96), dtype)
    fk = lambda q, k, v: cross_scale_na2d_fused(q, k, v, 9)
    results["na_kernel_ms_448"] = (
        _timeit(fk, q, k, v) * 1e3
    )

    # Beyond-reference capability: 4096^2 output (reference ceiling is
    # 2048^2, README.md:98) via the streamed per-band donated-jit path.
    # Timed by wall clock across the band calls (multiple jits; the scalar
    # fetch at the end synchronizes through the tunnel) — includes ~8 band
    # dispatch round-trips, so this is a conservative figure.
    try:
        import time

        from naf_tpu.api import naf_streamed

        img512 = jnp.asarray(rng.randn(1, 512, 512, 3), dtype)
        feats4k = jnp.asarray(rng.randn(1, 256, 256, 384), dtype)
        o = naf_streamed(model, params, img512, feats4k, (4096, 4096),
                         band_rows=512)
        ok = bool(jnp.isfinite(o[0, ::512, ::512, 0].astype(jnp.float32)).all())
        _ = float(o[0, -1, -1, 0])
        del o
        t0 = time.time()
        o = naf_streamed(model, params, img512, feats4k, (4096, 4096),
                         band_rows=512)
        _ = float(o[0, -1, -1, 0])
        t4k = time.time() - t0
        del o
        if ok:
            results["fps_4096"] = 1.0 / t4k
    except Exception as e:
        results["fps_4096_error"] = f"{type(e).__name__}: {e}"[:120]

    ref_fps = 1000.0 / 56.24  # A100 reference, test_results.json:243-256
    line = {
        "metric": "naf_fwd_fps_448_r16_dim384",
        "value": round(results["fps_448"], 2),
        "unit": "fps",
        "vs_baseline": round(results["fps_448"] / ref_fps, 2),
        "fps_2048_r16": round(results["fps_2048"], 2),
        "fps_448to2048_r16": round(results["fps_448to2048"], 2),
        "bwd_ms_448_r16": round(results["bwd_ms_448"], 2),
        "na_kernel_ms_448": round(results["na_kernel_ms_448"], 3),
        "device": str(jax.devices()[0]),
        "dtype": "bfloat16",
    }
    for key in ("fps_4096", "fps_4096_error"):
        if key in results:
            line[key] = (
                round(results[key], 3) if key == "fps_4096" else results[key]
            )
    print(json.dumps(line))


if __name__ == "__main__":
    main()
