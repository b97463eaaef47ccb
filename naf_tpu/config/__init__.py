from naf_tpu.config.core import (  # noqa: F401
    load_config,
    instantiate,
    get_feature,
    get_patch_size,
)
