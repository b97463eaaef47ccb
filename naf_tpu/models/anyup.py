"""AnyUp baseline — feature-agnostic windowed attention upsampler.

The reference integrates AnyUp purely as an external hub model
(src/model/anyup.py:8-15: ``torch.hub.load("wimmerth/anyup")`` behind a
wrapper that first bilinear-resizes the image to the output size; the
wrapper's constructor signature is ``dim=256, radius=3, groups=8``). The hub
architecture itself is NOT vendored in the reference repository, so this
module is a TPU-native implementation of the published design rather than a
line-level port: a conv image encoder provides queries at the output
resolution and (pooled) keys on the feature grid, and a windowed
cross-attention of radius ``radius`` aggregates the RAW input features as
values — features never pass through learned projections, which is what
makes the upsampler agnostic to the feature dimension of the backbone.

For weight-level parity with a locally downloaded hub checkpoint, convert
its state dict to this parameter tree and pass it through
``naf_tpu.models.registry.ModelWrapper`` — ``convert_checkpoint`` maps the
encoder/attention tensors it recognizes and raises on unknown keys so a
mismatch is loud, not silent.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from naf_tpu.nn.attention import CrossScaleAttention
from naf_tpu.nn.conv import Encoder
from naf_tpu.ops.pool import adaptive_avg_pool2d
from naf_tpu.ops.resize import resize_bilinear

__all__ = ["AnyUpsampler", "convert_checkpoint"]


class AnyUpsampler(nn.Module):
    """``__call__(image, features, output_size)`` -> (B, H_o, W_o, C).

    dim/radius/groups follow the reference wrapper defaults
    (src/model/anyup.py:9). The image is bilinear-resized to the output
    size first (wrapper semantics, src/model/anyup.py:14), so the encoder
    always runs at output resolution.
    """

    dim: int = 256
    radius: int = 3
    groups: int = 8
    img_layers: int = 2

    def setup(self):
        self.encoder = Encoder(
            self.dim, kernel_size=3, ks_res=3, num_layers=self.img_layers,
            name="encoder",
        )
        self.attention = CrossScaleAttention(
            dim=self.dim,
            num_heads=self.groups,
            kernel_size=2 * self.radius + 1,
            name="attention",
        )

    def __call__(
        self,
        image: jnp.ndarray,
        features: jnp.ndarray,
        output_size: Tuple[int, int],
        *args,
        **kwargs,
    ) -> jnp.ndarray:
        oh, ow = int(output_size[0]), int(output_size[1])
        image = resize_bilinear(image, (oh, ow))
        x = self.encoder(image)
        queries = x
        keys = adaptive_avg_pool2d(x, features.shape[1:3])
        return self.attention(queries, keys, features)


def convert_checkpoint(state_dict, img_layers: int = 2):
    """Convert a torch AnyUp state dict to the ``AnyUpsampler`` param tree.

    The learned state of this upsampler is its conv image encoder (the
    windowed cross-attention is parameter-free: queries/keys come from the
    shared encoder and the values are the RAW input features — that is the
    feature-agnostic design). The expected tensor layout is the standard
    ``encoder()``-Sequential convention shared with the NAF checkpoint
    (reference src/layers/convolutions.py:67-92):

        {prefix}.0.weight / .0.bias                  entry conv (OIHW)
        {prefix}.{1+i}.norm{1,2}.weight / .bias      EncBlock GroupNorms
        {prefix}.{1+i}.conv{1,2}.weight / .bias      EncBlock convs (OIHW)

    where ``prefix`` is auto-detected from the keys present (``encoder``,
    ``upsampler.encoder``, ``model.encoder``, or bare indices). Conv kernels
    transpose OIHW -> HWIO; GroupNorm weight/bias map to scale/bias. Strict
    accounting: any checkpoint key not consumed raises KeyError with the
    leftovers listed, so a hub layout drift is loud, not silent.

    No wimmerth/anyup checkpoint is reachable in this environment (no
    network egress), so this mapping is validated against synthetically
    keyed state dicts only (tests/test_models_zoo.py); a locally downloaded
    checkpoint whose keys follow a different scheme will fail loudly here
    and needs only a prefix/rename extension, not a redesign.
    """
    from naf_tpu.convert import _KeyTracker, convert_encoder

    keys = list(state_dict.keys())
    if not keys:
        raise KeyError("empty state dict")
    for prefix in ("encoder", "upsampler.encoder", "model.encoder", ""):
        probe = f"{prefix}.0.weight" if prefix else "0.weight"
        if probe in keys:
            break
    else:
        raise KeyError(
            "could not locate the encoder entry conv in the checkpoint "
            f"(tried encoder/upsampler.encoder/model.encoder/bare); keys: "
            f"{sorted(keys)[:8]}..."
        )
    consumed: set = set()
    tracked = _KeyTracker(state_dict, consumed)
    params = {"encoder": convert_encoder(tracked, prefix, img_layers)}
    leftovers = [k for k in keys if k not in consumed]
    if leftovers:
        raise KeyError(
            "checkpoint keys not consumed by the AnyUp converter (would be "
            f"silently dropped): {sorted(leftovers)}"
        )
    # Shape validation against the AnyUpsampler architecture (dim inferred
    # from the stem): stem (kh, kw, 3, dim), block convs (kh, kw, dim, dim),
    # all norms/biases (dim,).
    enc = params["encoder"]
    stem = enc["stem"]["conv"]["kernel"]
    if stem.ndim != 4 or stem.shape[2] != 3:
        raise ValueError(
            f"stem kernel (HWIO) must have 3 input channels, got {stem.shape}"
        )
    dim = stem.shape[3]
    for bname, block in enc.items():
        if not bname.startswith("block"):
            continue
        for cname in ("conv1", "conv2"):
            kshape = block[cname]["conv"]["kernel"].shape
            if kshape[2:] != (dim, dim):
                raise ValueError(
                    f"encoder.{bname}.{cname}: expected (*, *, {dim}, {dim}) "
                    f"HWIO kernel, got {kshape}"
                )
        for nname in ("norm1", "norm2"):
            if block[nname]["scale"].shape != (dim,):
                raise ValueError(
                    f"encoder.{bname}.{nname}: expected ({dim},) affine, got "
                    f"{block[nname]['scale'].shape}"
                )
    return params
