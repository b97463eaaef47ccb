"""Public zero-shot upsampling API (reference hub path, hubconf.py:8-24).

The reference exposes `naf = torch.hub.load("valeoai/NAF", "naf")` then
`naf(image, lr_feats, target_size)` with NCHW tensors. Equivalents here:

    model, params = load_naf_params()                  # random init
    model, params = load_naf_params("naf_release.pth") # converted weights
    hr = naf(model, params, image, lr_feats, (H, W))   # NCHW in/out

or the stateful convenience wrapper:

    ups = NAFUpsampler(params_or_path)
    hr = ups(image, lr_feats, (H, W))

Arrays may be numpy or jax; NCHW is accepted for reference-interface parity
(`channels_last=True` skips the transposes and is the TPU-native layout).
Calls are jit-compiled and cached per (shapes, target_size).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from naf_tpu.convert import naf_params_from_torch
from naf_tpu.models.naf import NAF

__all__ = ["naf", "load_naf_params", "NAFUpsampler"]


def load_naf_params(
    checkpoint: Optional[str] = None,
    seed: int = 0,
    **model_kwargs,
):
    """Build a NAF model definition and parameters.

    Args:
      checkpoint: optional path to a reference-format torch state dict
        (e.g. the released naf_release.pth); converted to a flax pytree.
      model_kwargs: NAF hyperparameters (dim, heads_attn, kernel_size, ...).

    Returns:
      (model, params)
    """
    model = NAF(**model_kwargs)
    if checkpoint is not None:
        params = naf_params_from_torch(checkpoint, img_layers=model.img_layers)
        params = jax.tree.map(jnp.asarray, params)
    else:
        rng = jax.random.PRNGKey(seed)
        dummy_img = jnp.zeros((1, 32, 32, 3), jnp.float32)
        dummy_feat = jnp.zeros((1, 16, 16, model.heads_attn * 8), jnp.float32)
        params = model.init(rng, dummy_img, dummy_feat, (32, 32))["params"]
    return model, params


@functools.partial(
    jax.jit, static_argnames=("model", "target_size", "channels_last")
)
def _naf_apply(model, params, image, lr_feats, target_size, channels_last):
    if not channels_last:
        image = jnp.transpose(image, (0, 2, 3, 1))
        lr_feats = jnp.transpose(lr_feats, (0, 2, 3, 1))
    out = model.apply({"params": params}, image, lr_feats, target_size)
    if not channels_last:
        out = jnp.transpose(out, (0, 3, 1, 2))
    return out


def naf(
    model: NAF,
    params,
    image,
    lr_feats,
    target_size: Tuple[int, int],
    channels_last: bool = False,
):
    """Upsample `lr_feats` to `target_size`, guided by `image`.

    Mirrors the reference forward contract (src/model/naf.py:104-116):
    image (B, 3, H_img, W_img), lr_feats (B, C, h, w) -> (B, C, *target_size)
    (NHWC when channels_last=True).
    """
    return _naf_apply(
        model,
        params,
        jnp.asarray(image),
        jnp.asarray(lr_feats),
        (int(target_size[0]), int(target_size[1])),
        channels_last,
    )


class NAFUpsampler:
    """Stateful convenience wrapper mirroring the hub module's usage."""

    def __init__(self, params=None, checkpoint=None, **model_kwargs):
        if params is not None:
            self.model = NAF(**model_kwargs)
            self.params = params
        else:
            self.model, self.params = load_naf_params(checkpoint, **model_kwargs)

    def __call__(self, image, lr_feats, target_size, channels_last=False):
        return naf(
            self.model, self.params, image, lr_feats, target_size, channels_last
        )
