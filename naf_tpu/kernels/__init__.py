from naf_tpu.kernels.na2d_fused import cross_scale_na2d_fused  # noqa: F401
