from naf_tpu.train.losses import Loss, mse_loss  # noqa: F401
from naf_tpu.train.distill import compute_feats, round_to_nearest_multiple  # noqa: F401
