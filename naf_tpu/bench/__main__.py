"""Benchmark sweep CLI (reference test/ harness UX, test/conftest.py:4-8):

    python -m naf_tpu.bench --ratio            # sweep ratios 2..32
    python -m naf_tpu.bench --img-size         # sweep output sizes
    python -m naf_tpu.bench --embed-dim --models NAF JAFAR --bf16

Exactly one sweep factor per run (test/test_utils.py:41-43); results merge
into benchmarks/results.json keyed on (model, factor, dims).
"""

import argparse

import jax
import jax.numpy as jnp

from naf_tpu.bench.harness import MODELS, SWEEPS, run_sweep

# Persistent compile cache (axon remote compiles cost minutes per kernel).
jax.config.update("jax_compilation_cache_dir", "/tmp/naf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    ap = argparse.ArgumentParser()
    for factor in SWEEPS:
        ap.add_argument(
            f"--{factor.replace('_', '-')}", action="store_true",
            help=f"sweep {factor} over {SWEEPS[factor]}",
        )
    ap.add_argument("--large-img", action="store_true",
                    help="end-to-end backbone+NAF rows (896^2/r2, 1792^2/r4)")
    ap.add_argument("--models", nargs="+", default=MODELS)
    ap.add_argument("--values", nargs="+", type=int, default=None)
    ap.add_argument("--out", default="benchmarks/results.json")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--no-backward", action="store_true")
    args = ap.parse_args()

    if args.large_img:
        from naf_tpu.bench.harness import benchmark_large_img

        for size, ratio in ((896, 2), (1792, 4)):
            rec = benchmark_large_img(
                size, ratio,
                dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
                out_path=args.out,
                # 1792^2 fused into one program crashes the v5e worker
                # (bf16) / exceeds HBM at compile (f32); two-program sum
                # matches the torch-eager reference semantics anyway.
                split_programs=(size == 1792),
            )
            print(rec)
        return

    chosen = [f for f in SWEEPS if getattr(args, f)]
    if len(chosen) != 1:
        ap.error(f"choose exactly one sweep factor of {list(SWEEPS)}")
    run_sweep(
        chosen[0],
        models=args.models,
        values=args.values,
        out_path=args.out,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        backward=not args.no_backward,
    )


if __name__ == "__main__":
    main()
