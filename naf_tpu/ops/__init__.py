from naf_tpu.ops.resize import (  # noqa: F401
    resize_nearest_exact,
    resize_bilinear,
)
from naf_tpu.ops.pool import adaptive_avg_pool2d  # noqa: F401
from naf_tpu.ops.window import (  # noqa: F401
    na_window_start,
    na_gather_indices,
    cross_scale_lr_indices,
)
from naf_tpu.ops.na2d import na2d, cross_scale_na2d  # noqa: F401
