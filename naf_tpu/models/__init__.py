from naf_tpu.models.naf import NAF, ImageEncoder  # noqa: F401
