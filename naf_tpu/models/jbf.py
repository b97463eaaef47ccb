"""Joint bilateral filter upsampler (reference src/model/jbf.py:11-32).

The reference dispatches to kornia's joint_bilateral_blur (C++/CUDA torch
ops); here the small fixed window is a pure-JAX unfold + Gaussian weighting
(SURVEY §2.9 item 3). Pipeline: 4x bilinear pre-upsample, joint bilateral
filter guided by the normalized image, bilinear resize to the output size.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from naf_tpu.ops.adaptive_conv import reflect_pad2d, unfold_nhwc
from naf_tpu.ops.resize import resize_bilinear

__all__ = ["JBF", "joint_bilateral_blur"]


def joint_bilateral_blur(
    inp: jnp.ndarray,
    guidance: jnp.ndarray,
    kernel_size: int = 5,
    sigma_color: float = 0.1,
    sigma_space: float = 1.5,
) -> jnp.ndarray:
    """kornia.filters.joint_bilateral_blur semantics, NHWC, reflect border."""
    r = kernel_size // 2
    gw = unfold_nhwc(reflect_pad2d(guidance, r), kernel_size)  # (B,k2,H,W,C)
    diff2 = jnp.sum((gw - guidance[:, None]) ** 2, axis=-1)  # (B,k2,H,W)
    color_kernel = jnp.exp(-0.5 / (sigma_color ** 2) * diff2)

    ax = np.arange(kernel_size, dtype=np.float32) - r
    g1 = np.exp(-0.5 * (ax / sigma_space) ** 2)
    space = (g1[:, None] * g1[None, :]).reshape(-1)
    space = jnp.asarray(space / space.sum(), inp.dtype)

    kernel = color_kernel * space[None, :, None, None]
    kernel = kernel / jnp.sum(kernel, axis=1, keepdims=True)

    iw = unfold_nhwc(reflect_pad2d(inp, r), kernel_size)  # (B,k2,H,W,C)
    return jnp.sum(iw * kernel[..., None], axis=1)


class JBF(nn.Module):
    kernel_size: int = 5
    sigma_color: float = 0.1
    sigma_spatial: float = 1.5

    def __call__(self, image_norm, image, output_size, *args, **kwargs):
        h, w = image.shape[1], image.shape[2]
        up = resize_bilinear(image, (h * 4, w * 4))
        guide = resize_bilinear(image_norm, (h * 4, w * 4))
        out = joint_bilateral_blur(
            up, guide, self.kernel_size, self.sigma_color, self.sigma_spatial
        )
        return resize_bilinear(out, output_size)
