from naf_tpu.evals.denoising import (  # noqa: F401
    NoiseGenerator,
    DenoisingLoss,
    psnr,
    ssim,
)
from naf_tpu.evals.seg_probing import LinearProbe, SegMetrics  # noqa: F401
from naf_tpu.evals.video_seg import (  # noqa: F401
    label_propagation,
    restrict_neighborhood,
    davis_eval_iou,
    davis_eval_boundary,
    davis_statistics,
)
