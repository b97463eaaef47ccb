from naf_tpu.bench.harness import run_sweep, benchmark_model  # noqa: F401
