"""FeatUp / JBU baselines (reference src/model/featup.py, src/model/jbu.py).

JBULearnedRange: a learned joint bilateral filter — softmax range kernel from
a projected guidance (unfold over a (2r+1)^2 window) times a Gaussian spatial
kernel, applied to the bicubic-upsampled source with a spatially-varying
convolution. The reference's CUDA AdaptiveConv (featup.py:126) is replaced by
naf_tpu.ops.adaptive_conv (shifted multiply-adds, XLA-fused).

FeatUp: ChannelNorm + a stack of four 2x JBU units with a shared fixup
projection applied as `proj(x) * 0.1 + x` (featup.py:23-57).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from naf_tpu.ops.adaptive_conv import adaptive_conv, reflect_pad2d
from naf_tpu.ops.pool import adaptive_avg_pool2d
from naf_tpu.ops.resize import resize_bicubic, resize_bilinear

__all__ = [
    "JBULearnedRange", "JBUStack", "FeatUp", "JBU", "featup_params_from_torch",
]


def _conv1x1(state, key):
    """torch Conv2d 1x1 (O, I, 1, 1) -> flax Conv {kernel (1,1,I,O), bias}."""
    w = np.asarray(state[f"{key}.weight"], np.float32)
    return {
        "kernel": w.transpose(2, 3, 1, 0),
        "bias": np.asarray(state[f"{key}.bias"], np.float32),
    }


def featup_params_from_torch(state) -> dict:
    """FeatUp hub checkpoint -> flax FeatUp params.

    Mirrors the reference's load-time remap (utils/wrapper.py:22-28): keep
    only the `upsampler.*` (JBUStack) and `model.1.norm.*` (ChannelNorm)
    entries of `state["state_dict"]`, renaming `model.1.` -> `norm.`.
    Module tree per src/model/featup.py: JBULearnedRange range_proj /
    fixup_proj are Sequentials with convs at indices (0, 3); the stack-level
    fixup_proj is Sequential(Dropout2d, Conv2d) -> index 1.
    """
    if "state_dict" in state:
        state = state["state_dict"]
    state = {
        k.replace("model.1.", "norm."): (
            v.detach().cpu().numpy() if hasattr(v, "detach") else v
        )
        for k, v in state.items()
        if "upsampler" in k or "model.1.norm" in k
    }
    params = {
        "norm": {"norm": {
            "scale": np.asarray(state["norm.norm.weight"], np.float32),
            "bias": np.asarray(state["norm.norm.bias"], np.float32),
        }},
        "upsampler": {
            "fixup_proj": _conv1x1(state, "upsampler.fixup_proj.1"),
        },
    }
    for up in ("up1", "up2", "up3", "up4"):
        p = f"upsampler.{up}"
        params["upsampler"][up] = {
            "range_temp": np.asarray(state[f"{p}.range_temp"], np.float32),
            "sigma_spatial": np.asarray(state[f"{p}.sigma_spatial"], np.float32),
            "range_proj1": _conv1x1(state, f"{p}.range_proj.0"),
            "range_proj2": _conv1x1(state, f"{p}.range_proj.3"),
            "fixup_proj1": _conv1x1(state, f"{p}.fixup_proj.0"),
            "fixup_proj2": _conv1x1(state, f"{p}.fixup_proj.3"),
        }
    return params


class JBULearnedRange(nn.Module):
    guidance_dim: int = 3
    key_dim: int = 32
    radius: int = 3
    combine: bool = True

    @nn.compact
    def __call__(self, source, guidance):
        # The filter pipeline runs in f32 regardless of input dtype: the
        # range kernel is a softmax over learned similarities (bf16 there is
        # numerically dubious), and empirically XLA schedules the mixed
        # bf16 graph ~2x slower than the all-f32 one on TPU (73 vs 32 ms at
        # 448^2) — the f32 pipeline is both more accurate and faster.
        out_dtype = source.dtype
        source = source.astype(jnp.float32)
        guidance = guidance.astype(jnp.float32)
        d = 2 * self.radius + 1
        gh, gw = guidance.shape[1], guidance.shape[2]

        # learned range kernel (featup.py:89-99); Dropout2d is inference-off.
        # Computed as an offset loop of fused multiply-reduces — materializing
        # the (B, d^2, H, W, key_dim) unfold would cost GBs at 448^2+.
        proj = nn.Conv(self.key_dim, (1, 1), name="range_proj1")(guidance)
        proj = nn.gelu(proj, approximate=False)
        proj = nn.Conv(self.key_dim, (1, 1), name="range_proj2")(proj)
        padded = reflect_pad2d(proj, self.radius)
        range_temp = self.param("range_temp", nn.initializers.zeros, ())
        temp = jnp.clip(jnp.exp(range_temp), 1e-4, 1e4)
        logits = jnp.stack(
            [
                jnp.sum(padded[:, i : i + gh, j : j + gw] * proj, axis=-1)
                for i in range(d)
                for j in range(d)
            ],
            axis=1,
        ) * temp
        range_kernel = nn.softmax(logits, axis=1)  # (B, d2, H, W)

        # Gaussian spatial kernel (featup.py:101-105)
        sigma_spatial = self.param("sigma_spatial", nn.initializers.ones, ())
        dist = np.linspace(-1, 1, d, dtype=np.float32)
        patch_sq = dist[:, None] ** 2 + dist[None, :] ** 2
        spatial = jnp.exp(
            -jnp.asarray(patch_sq.reshape(-1)) / (2 * sigma_spatial ** 2)
        )

        kernel = range_kernel * spatial[None, :, None, None]
        kernel = kernel / jnp.clip(jnp.sum(kernel, axis=1, keepdims=True), 1e-7)

        if self.combine:
            fix_in = jnp.concatenate(
                [jnp.moveaxis(kernel, 1, -1), guidance], axis=-1
            )
            fix = nn.Conv(d * d, (1, 1), name="fixup_proj1")(fix_in)
            fix = nn.gelu(fix, approximate=False)
            fix = nn.Conv(d * d, (1, 1), name="fixup_proj2")(fix)
            kernel = kernel + 0.1 * jnp.moveaxis(fix, -1, 1)

        kernel = jnp.moveaxis(kernel, 1, -1).reshape(
            kernel.shape[0], gh, gw, d, d
        )
        hr_source = resize_bicubic(source, (gh, gw))
        out = adaptive_conv(reflect_pad2d(hr_source, self.radius), kernel)
        return out.astype(out_dtype)


class JBUStack(nn.Module):
    feat_dim: int
    ratio: int = 16

    def setup(self):
        if self.ratio not in (2, 4, 8, 16):
            raise ValueError(
                "ratio must be one of 2/4/8/16 (reference JBUStack assert,\n src/model/featup.py:32)"
            )
        self.up1 = JBULearnedRange(3, 32, radius=3)
        self.up2 = JBULearnedRange(3, 32, radius=3)
        self.up3 = JBULearnedRange(3, 32, radius=3)
        self.up4 = JBULearnedRange(3, 32, radius=3)
        self.fixup_proj = nn.Conv(self.feat_dim, (1, 1), name="fixup_proj")

    def _up(self, source, guidance, up):
        h, w = source.shape[1], source.shape[2]
        small_guidance = adaptive_avg_pool2d(guidance, (h * 2, w * 2))
        return up(source, small_guidance)

    def __call__(self, source, guidance):
        ups = [self.up1, self.up2, self.up3, self.up4]
        n = {2: 1, 4: 2, 8: 3, 16: 4}[self.ratio]
        x = source
        for i in range(n):
            x = self._up(x, guidance, ups[i])
            out = self.fixup_proj(x) * 0.1 + x
        return out


class ChannelNorm(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)


class FeatUp(nn.Module):
    feature_dim: int = 384
    ratio: int = 16
    use_norm: bool = True

    @nn.compact
    def __call__(self, image, features, output_size=None, *args, **kwargs):
        if self.use_norm:
            features = ChannelNorm(self.feature_dim, name="norm")(features)
        return JBUStack(self.feature_dim, self.ratio, name="upsampler")(
            features, image
        )


class JBU(nn.Module):
    """Single learned-JBU filtering baseline (reference src/model/jbu.py)."""

    dim: int = 256
    radius: int = 5
    combine: bool = False

    @nn.compact
    def __call__(self, image_norm, image, output_size, *args, **kwargs):
        guidance = resize_bilinear(image_norm, output_size)
        source = resize_bilinear(image, output_size)
        return JBULearnedRange(
            3, self.dim // 4, radius=self.radius, combine=self.combine,
            name="bilateral_filter",
        )(source, guidance)
