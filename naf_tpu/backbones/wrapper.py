"""Uniform backbone access (reference PretrainedViTWrapper,
src/backbone/vit_wrapper.py:46-180).

`PretrainedViTWrapper(name, checkpoint=...)` resolves a model family from the
name (patch size parsed via the same `patch(\\d+)` regex, per-family
overrides), loads + converts a local torch checkpoint (this environment has
no network egress; the reference downloads from timm/torch.hub), and exposes:

    wrapper(image_nhwc_normalized) -> (B, H/ps, W/ps, C)   feature map
    wrapper.config                 -> {"mean", "std", "input_size", "ps"}
    wrapper.embed_dim, wrapper.patch_size

Random initialization (checkpoint=None) is supported for tests/smoke runs.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import jax.numpy as jnp

from naf_tpu.backbones.vit import ViT, ViTConfig
from naf_tpu.backbones.convert import vit_from_torch

__all__ = ["PretrainedViTWrapper", "load_multiple_backbones", "BACKBONE_REGISTRY"]

IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
OPENAI_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)

# name fragment -> (num_heads by dim, normalization, input size) defaults for
# the reference MODEL_LIST families (vit_wrapper.py:15-40). Heads follow the
# standard ViT sizing: dim/64.
_SIZES = {"small": 384, "base": 768, "large": 1024, "giant": 1536, "tiny": 192,
          "vits": 384, "vitb": 768, "vitl": 1024, "vit7b": 4096}

BACKBONE_REGISTRY = {
    "vit_base_patch16_224.dino": dict(input_size=224),
    # RADIO normalizes internally: identity stats (vit_wrapper.py:102-106)
    "radio_v2.5-b": dict(input_size=512, mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0)),
    "radio_v2.5-l": dict(input_size=512, mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0)),
    "franca_vitb14": dict(input_size=448),
    "franca_vitl14": dict(input_size=448),
    "capi_vitl14": dict(input_size=448),
    "vit_base_patch14_dinov2.lvd142m": dict(input_size=518),
    "vit_small_patch14_dinov2.lvd142m": dict(input_size=518),
    "vit_base_patch14_reg4_dinov2": dict(input_size=518),
    "vit_base_patch16_dinov3.lvd1689m": dict(input_size=512),
    "vit_large_patch16_dinov3.lvd1689m": dict(input_size=512),
    "vit_base_patch16_siglip_512.v2_webli": dict(
        input_size=512, mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)
    ),
    "vit_large_patch16_224.mae": dict(input_size=224),
    # Meta Perception Encoder (vit_wrapper.py:30-33): 0.5-normalization per
    # perception_models' image transform
    "vit_pe_core_small_patch16_384.fb": dict(
        input_size=384, mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)
    ),
    "vit_pe_core_tiny_patch16_384.fb": dict(
        input_size=384, mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)
    ),
    "vit_pe_spatial_tiny_patch16_512.fb": dict(
        input_size=512, mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)
    ),
    "vit_pe_spatial_small_patch16_512.fb": dict(
        input_size=512, mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)
    ),
}


def _patch_size_from_name(name: str) -> int:
    m = re.search(r"patch(\d+)", name)
    ps = int(m.group(1)) if m else 16
    if "franca" in name or "capi" in name:
        ps = 14
    if "convnext" in name:
        ps = 32
    return ps


def _embed_dim_from_name(name: str) -> int:
    for frag, dim in _SIZES.items():
        if frag in name:
            return dim
    return 768


def _apply_rasa(rasa_params, feats: jnp.ndarray) -> jnp.ndarray:
    """Franca RASA head: an ordered stack of per-token linear layers (GELU
    between) over the patch features (vit_wrapper.py:161-165 consumes
    forward_features(use_rasa_head=True)["patch_token_rasa"])."""
    n = len(rasa_params)
    x = feats
    for i in range(n):
        p = rasa_params[f"linear{i}"]
        x = x @ jnp.asarray(p["kernel"], x.dtype) + jnp.asarray(p["bias"], x.dtype)
        if i < n - 1:
            x = jax.nn.gelu(x, approximate=False)  # torch F.gelu default
    return x


class PretrainedViTWrapper:
    def __init__(
        self,
        name: str,
        checkpoint: Optional[str] = None,
        num_heads: Optional[int] = None,
        dtype=jnp.float32,
        seed: int = 0,
        **kwargs,
    ):
        # dvt_/fit3d_ finetuned-weight prefixes (vit_wrapper.py:60-68,89-94):
        # strip the tag, remember it; the checkpoint holds the base trunk's
        # finetuned weights (dvt ckpts nest them under "model").
        self.finetune_tag = None
        for tag in ("dvt_", "fit3d_"):
            if name.startswith(tag):
                self.finetune_tag = tag[:-1]
                name = name[len(tag):]
                break
        self.name = name
        self.patch_size = _patch_size_from_name(name)
        reg = BACKBONE_REGISTRY.get(name, {})
        self.config = {
            "mean": tuple(reg.get("mean", IMAGENET_DEFAULT_MEAN)),
            "std": tuple(reg.get("std", IMAGENET_DEFAULT_STD)),
            "input_size": (3, reg.get("input_size", 448), reg.get("input_size", 448)),
            "ps": self.patch_size,
        }

        import dataclasses

        # bf16 extraction takes the native MXU path; f32 stays reference-exact
        precision = "default" if dtype == jnp.bfloat16 else "highest"

        self.rasa_params = None
        if checkpoint is not None:
            import torch

            state = torch.load(checkpoint, map_location="cpu", weights_only=True)
            if "state_dict" in state:
                state = state["state_dict"]
            if "model" in state and not any(k.startswith("blocks.") for k in state):
                state = state["model"]
            dim = _embed_dim_from_name(name)
            heads = num_heads or max(dim // 64, 1)
            if "radio" in name:
                from naf_tpu.backbones.convert import convert_radio

                params, cfg = convert_radio(state, heads)
            elif "franca" in name:
                from naf_tpu.backbones.convert import convert_franca

                params, cfg, rasa = convert_franca(state, heads)
                self.rasa_params = jax.tree.map(
                    lambda a: jnp.asarray(a, dtype), rasa
                )
            elif "capi" in name:
                from naf_tpu.backbones.convert import convert_capi

                params, cfg = convert_capi(state, heads)
            else:
                params, cfg = vit_from_torch(state, heads)
            self.params = jax.tree.map(lambda a: jnp.asarray(a, dtype), params)
            self.vit_config = dataclasses.replace(cfg, precision=precision)
        else:
            dim = _embed_dim_from_name(name)
            heads = num_heads or max(dim // 64, 1)
            is_pe = "_pe_" in name or name.startswith("pe_")
            self.vit_config = ViTConfig(
                patch_size=self.patch_size,
                embed_dim=dim,
                depth=12,
                num_heads=heads,
                pos_grid=self.config["input_size"][1] // self.patch_size,
                precision=precision,
                # DINOv3 family: rotary positions, 4 register tokens.
                # PE: interleaved Rope2D + learned positions + pre-LN.
                rope_theta=(
                    10000.0 if is_pe else 100.0 if "dinov3" in name else None
                ),
                num_reg_tokens=4 if "dinov3" in name else 0,
                use_cls_pos="dinov3" not in name,
                rope_style="interleaved" if is_pe else "rotate_half",
                use_abs_pos=True if is_pe else None,
                ln_pre=is_pe,
                patch_bias=not is_pe,
                layerscale=not is_pe,
                ln_eps=1e-5 if is_pe else 1e-6,
            )
            model = ViT(self.vit_config)
            # param shapes don't depend on input size (pos grid is config)
            dummy = jnp.zeros((1, self.patch_size * 2, self.patch_size * 2, 3), jnp.float32)
            self.params = model.init(jax.random.PRNGKey(seed), dummy)["params"]
            self.params = jax.tree.map(lambda a: a.astype(dtype), self.params)

        self.model = ViT(self.vit_config)
        self.embed_dim = self.vit_config.embed_dim
        self.patch_size = self.vit_config.patch_size
        self.config["ps"] = self.patch_size

    def __call__(self, image: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) normalized image -> (B, H/ps, W/ps, C)."""
        feats = self.model.apply({"params": self.params}, image)
        if self.rasa_params is not None:
            feats = _apply_rasa(self.rasa_params, feats)
        return feats

    def normalize(self, image01: jnp.ndarray) -> jnp.ndarray:
        """Apply this backbone's normalization to a [0, 1] NHWC image."""
        mean = jnp.asarray(self.config["mean"], image01.dtype)
        std = jnp.asarray(self.config["std"], image01.dtype)
        return (image01 - mean) / std


def load_multiple_backbones(cfg, dtype=jnp.float32):
    """List-or-single backbone config -> list of wrappers (reference
    utils/training.py:193-231): training consumes the first, the others are
    kept for side-by-side logging/eval. ``cfg`` is the ``backbone`` config
    group: ``name`` may be a string or a list; ``checkpoint`` may be a
    string, a list aligned with ``name``, or absent (random init)."""
    names = cfg["name"] if isinstance(cfg["name"], (list, tuple)) else [cfg["name"]]
    ckpts = cfg.get("checkpoint")
    if not isinstance(ckpts, (list, tuple)):
        ckpts = [ckpts] * len(names)
    if len(ckpts) != len(names):
        raise ValueError(
            f"backbone.checkpoint has {len(ckpts)} entries for {len(names)} names"
        )
    return [
        PretrainedViTWrapper(n, checkpoint=c, dtype=dtype)
        for n, c in zip(names, ckpts)
    ]
