from naf_tpu.utils.benchmarking import device_time_ms  # noqa: F401
