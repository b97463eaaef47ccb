"""Flax ViT parity vs HuggingFace Dinov2 (random init, CPU torch)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from naf_tpu.backbones import ViT
from naf_tpu.backbones.convert import convert_hf_dinov2


def _hf_dinov2(image_size=56, patch=14, dim=64, depth=2, heads=2, regs=0):
    from transformers import Dinov2Config, Dinov2Model

    cfg = Dinov2Config(
        hidden_size=dim,
        num_hidden_layers=depth,
        num_attention_heads=heads,
        intermediate_size=dim * 4,
        image_size=image_size,
        patch_size=patch,
        layerscale_value=0.5,
    )
    torch.manual_seed(0)
    model = Dinov2Model(cfg)
    model.eval()
    return model


def test_vit_matches_hf_dinov2_native_grid():
    model = _hf_dinov2()
    x = np.random.RandomState(0).randn(2, 3, 56, 56).astype(np.float32)
    with torch.no_grad():
        out = model(torch.from_numpy(x)).last_hidden_state  # (B, 1+N, C)
    want = out[:, 1:].numpy().reshape(2, 4, 4, 64)

    params, cfg = convert_hf_dinov2(dict(model.state_dict()), num_heads=2)
    assert cfg.patch_size == 14 and cfg.depth == 2 and cfg.pos_grid == 4
    got = ViT(cfg).apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_vit_dynamic_size_interpolates_pos():
    """Different input size: HF interpolates pos embeddings (bicubic); ours
    too — allow loose tolerance for resize-kernel differences."""
    model = _hf_dinov2()
    x = np.random.RandomState(1).randn(1, 3, 84, 70).astype(np.float32)
    with torch.no_grad():
        out = model(torch.from_numpy(x)).last_hidden_state
    want = out[:, 1:].numpy().reshape(1, 6, 5, 64)

    params, cfg = convert_hf_dinov2(dict(model.state_dict()), num_heads=2)
    got = np.asarray(
        ViT(cfg).apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    )
    cos = np.sum(got * want) / (np.linalg.norm(got) * np.linalg.norm(want))
    assert cos > 0.999, cos


def test_wrapper_random_init_contract():
    from naf_tpu.backbones import PretrainedViTWrapper

    w = PretrainedViTWrapper("vit_small_patch14_dinov2.lvd142m", num_heads=6)
    assert w.patch_size == 14 and w.embed_dim == 384
    img = jnp.zeros((1, 56, 56, 3), jnp.float32)
    feats = w(img)
    assert feats.shape == (1, 4, 4, 384)
    assert w.config["mean"] == (0.485, 0.456, 0.406)


def test_vit_matches_hf_dinov3():
    """DINOv3 family: per-block RoPE, no learned positions."""
    from transformers import DINOv3ViTConfig, DINOv3ViTModel

    from naf_tpu.backbones.convert import convert_hf_dinov3

    cfg = DINOv3ViTConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=256,
        patch_size=16,
        image_size=64,
        num_register_tokens=2,
        rope_theta=100.0,
    )
    torch.manual_seed(1)
    model = DINOv3ViTModel(cfg)
    model.eval()
    x = np.random.RandomState(2).randn(2, 3, 64, 48).astype(np.float32)
    with torch.no_grad():
        out = model(torch.from_numpy(x)).last_hidden_state  # (B, 1+R+N, C)
    want = out[:, 3:].numpy().reshape(2, 4, 3, 64)

    params, vcfg = convert_hf_dinov3(dict(model.state_dict()), num_heads=2)
    assert vcfg.rope_theta == 100.0 and vcfg.num_reg_tokens == 2
    got = ViT(vcfg).apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-4)
