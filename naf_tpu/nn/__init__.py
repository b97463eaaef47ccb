from naf_tpu.nn.rope import RoPE, rope_apply, rope_rotate_half  # noqa: F401
from naf_tpu.nn.conv import EncBlock, Encoder  # noqa: F401
from naf_tpu.nn.attention import CrossScaleAttention  # noqa: F401
