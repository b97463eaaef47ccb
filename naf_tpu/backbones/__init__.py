from naf_tpu.backbones.vit import ViT, ViTConfig  # noqa: F401
from naf_tpu.backbones.wrapper import PretrainedViTWrapper, BACKBONE_REGISTRY  # noqa: F401
