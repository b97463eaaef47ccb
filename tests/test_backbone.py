"""Flax ViT parity vs HuggingFace Dinov2 (random init, CPU torch)."""

import jax
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


def _synthetic_timm_state(dim=64, depth=2, heads=2, patch=16, grid=4, regs=0,
                          seed=0):
    """A timm-layout ViT state dict with random weights (timm itself is not
    in this environment; the layout mirrors VisionTransformer.state_dict())."""
    rng = np.random.RandomState(seed)
    t = lambda *s: torch.from_numpy(rng.randn(*s).astype(np.float32) * 0.05)
    state = {
        "patch_embed.proj.weight": t(dim, 3, patch, patch),
        "patch_embed.proj.bias": t(dim),
        "pos_embed": t(1, grid * grid + 1, dim),
        "cls_token": t(1, 1, dim),
        "norm.weight": t(dim),
        "norm.bias": t(dim),
    }
    if regs:
        state["reg_token"] = t(1, regs, dim)
    for i in range(depth):
        p = f"blocks.{i}"
        state.update({
            f"{p}.norm1.weight": t(dim), f"{p}.norm1.bias": t(dim),
            f"{p}.attn.qkv.weight": t(3 * dim, dim),
            f"{p}.attn.qkv.bias": t(3 * dim),
            f"{p}.attn.proj.weight": t(dim, dim),
            f"{p}.attn.proj.bias": t(dim),
            f"{p}.norm2.weight": t(dim), f"{p}.norm2.bias": t(dim),
            f"{p}.mlp.fc1.weight": t(4 * dim, dim),
            f"{p}.mlp.fc1.bias": t(4 * dim),
            f"{p}.mlp.fc2.weight": t(dim, 4 * dim),
            f"{p}.mlp.fc2.bias": t(dim),
        })
    return state


def test_radio_prefix_conversion_matches_bare_trunk():
    """RADIO nests a timm trunk under radio_model.model. plus conditioner /
    adaptor keys (vit_wrapper.py:97-109) — conversion must equal the bare
    trunk's and ignore the extras."""
    from naf_tpu.backbones.convert import convert_radio, convert_timm_vit

    bare = _synthetic_timm_state()
    wrapped = {f"radio_model.model.{k}": v for k, v in bare.items()}
    wrapped["radio_model.input_conditioner.norm_mean"] = torch.zeros(3)
    wrapped["radio_model.summary_idxs"] = torch.zeros(2)
    p_bare, cfg_bare = convert_timm_vit(bare, 2)
    p_radio, cfg_radio = convert_radio(wrapped, 2)
    assert cfg_bare == cfg_radio
    la = {str(k): v for k, v in jax.tree_util.tree_leaves_with_path(p_bare)}
    lb = {str(k): v for k, v in jax.tree_util.tree_leaves_with_path(p_radio)}
    assert la.keys() == lb.keys()
    for k in la:
        np.testing.assert_array_equal(la[k], lb[k])


def test_capi_storage_tokens_alias_and_prefix():
    """CAPI register tokens appear as storage_tokens under backbone.
    (vit_wrapper.py:115-118,167-169)."""
    from naf_tpu.backbones.convert import convert_capi

    bare = _synthetic_timm_state(regs=0)
    bare["storage_tokens"] = torch.zeros(1, 3, 64)
    wrapped = {f"backbone.{k}": v for k, v in bare.items()}
    params, cfg = convert_capi(wrapped, 2)
    assert cfg.num_reg_tokens == 3
    assert params["reg_tokens"].shape == (1, 3, 64)
    out = ViT(cfg).apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
    assert out.shape == (1, 4, 4, 64)


def test_franca_rasa_head_conversion_and_apply():
    """Franca: DINOv2-lineage trunk + RASA head applied to patch tokens
    (vit_wrapper.py:111-113,161-165)."""
    from naf_tpu.backbones.convert import convert_franca
    from naf_tpu.backbones.wrapper import _apply_rasa

    state = _synthetic_timm_state()
    rng = np.random.RandomState(3)
    state["rasa_head.mlp.0.weight"] = torch.from_numpy(
        rng.randn(32, 64).astype(np.float32))
    state["rasa_head.mlp.0.bias"] = torch.zeros(32)
    state["rasa_head.mlp.2.weight"] = torch.from_numpy(
        rng.randn(64, 32).astype(np.float32))
    state["rasa_head.mlp.2.bias"] = torch.zeros(64)
    params, cfg, rasa = convert_franca(state, 2)
    assert set(rasa) == {"linear0", "linear1"}
    assert rasa["linear0"]["kernel"].shape == (64, 32)
    feats = jnp.asarray(np.random.RandomState(4).randn(1, 4, 4, 64), jnp.float32)
    out = _apply_rasa(jax.tree.map(jnp.asarray, rasa), feats)
    assert out.shape == (1, 4, 4, 64)
    # GELU between layers, none after the last
    import torch.nn.functional as TF
    w0 = state["rasa_head.mlp.0.weight"].numpy()
    w1 = state["rasa_head.mlp.2.weight"].numpy()
    ref = torch.from_numpy(np.asarray(feats))
    ref = TF.gelu(ref @ torch.from_numpy(w0.T)) @ torch.from_numpy(w1.T)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-5)


def test_finetuned_prefix_wrapper_names():
    """dvt_/fit3d_ prefixes strip to the base trunk (vit_wrapper.py:60-68)."""
    from naf_tpu.backbones.wrapper import PretrainedViTWrapper

    w = PretrainedViTWrapper("dvt_vit_base_patch14_dinov2.lvd142m")
    assert w.finetune_tag == "dvt" and w.patch_size == 14
    w2 = PretrainedViTWrapper("fit3d_vit_base_patch16_224.dino")
    assert w2.finetune_tag == "fit3d" and w2.patch_size == 16


def test_load_multiple_backbones_list_config():
    """Reference trains on backbones[0] but loads the whole list
    (utils/training.py:193-231)."""
    from naf_tpu.backbones import load_multiple_backbones

    bbs = load_multiple_backbones(
        {"name": ["vit_base_patch16_224.dino", "dvt_vit_base_patch14_dinov2.lvd142m"]}
    )
    assert len(bbs) == 2
    assert bbs[0].patch_size == 16 and bbs[1].patch_size == 14
    assert bbs[1].finetune_tag == "dvt"
    single = load_multiple_backbones({"name": "vit_base_patch16_224.dino"})
    assert len(single) == 1
    with pytest.raises(ValueError):
        load_multiple_backbones({"name": ["a", "b"], "checkpoint": ["x"]})


class _TorchPE(torch.nn.Module):
    """Minimal torch reimplementation of Meta's Perception Encoder trunk
    (perception_models core/vision_encoder: CLIP-lineage naming, bias-free
    patchify, abs positions + per-block interleaved Rope2D theta=1e4,
    pre-LN transformer). Used as an independent numerics/key-naming anchor —
    timm and the PE package are absent in this environment."""

    def __init__(self, dim=64, depth=2, heads=2, patch=16, grid=4):
        super().__init__()
        self.dim, self.heads, self.patch, self.grid = dim, heads, patch, grid
        self.conv1 = torch.nn.Conv2d(3, dim, patch, patch, bias=False)
        self.class_embedding = torch.nn.Parameter(torch.randn(dim) * 0.02)
        self.positional_embedding = torch.nn.Parameter(
            torch.randn(grid * grid + 1, dim) * 0.02
        )
        self.ln_pre = torch.nn.LayerNorm(dim, eps=1e-5)
        blocks = []
        for _ in range(depth):
            blk = torch.nn.Module()
            blk.ln_1 = torch.nn.LayerNorm(dim, eps=1e-5)
            attn = torch.nn.Module()
            attn.in_proj_weight = torch.nn.Parameter(torch.randn(3 * dim, dim) * 0.05)
            attn.in_proj_bias = torch.nn.Parameter(torch.randn(3 * dim) * 0.02)
            attn.out_proj = torch.nn.Linear(dim, dim)
            blk.attn = attn
            blk.ln_2 = torch.nn.LayerNorm(dim, eps=1e-5)
            mlp = torch.nn.Module()
            mlp.c_fc = torch.nn.Linear(dim, dim * 4)
            mlp.c_proj = torch.nn.Linear(dim * 4, dim)
            blk.mlp = mlp
            blocks.append(blk)
        self.transformer = torch.nn.Module()
        self.transformer.resblocks = torch.nn.ModuleList(blocks)
        self.ln_post = torch.nn.LayerNorm(dim, eps=1e-5)

    def _rope(self, t, gh, gw):
        """(B, nH, T, d) patch tokens -> rotated, PE Rope2D semantics."""
        d = t.shape[-1]
        n = d // 4
        freqs = 1.0 / (10000.0 ** (4 * torch.arange(n).float() / d))
        idx = torch.arange(gh * gw).float()
        tx, ty = idx % gw, torch.div(idx, gw, rounding_mode="floor")
        ang = torch.cat([tx[:, None] * freqs, ty[:, None] * freqs], dim=1)
        cis = torch.polar(torch.ones_like(ang), ang)  # (T, d/2) complex
        tc = torch.view_as_complex(t.reshape(*t.shape[:-1], d // 2, 2))
        return torch.view_as_real(tc * cis[None, None]).reshape(t.shape)

    def forward(self, x):
        b = x.shape[0]
        x = self.conv1(x)  # (B, C, gh, gw)
        gh, gw = x.shape[-2:]
        x = x.flatten(2).transpose(1, 2)  # (B, T, C) row-major
        cls = self.class_embedding[None, None].expand(b, 1, -1)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding[None]
        x = self.ln_pre(x)
        d = self.dim // self.heads
        for blk in self.transformer.resblocks:
            h = blk.ln_1(x)
            qkv = h @ blk.attn.in_proj_weight.T + blk.attn.in_proj_bias
            q, k, v = qkv.chunk(3, dim=-1)

            def split(a):
                return a.reshape(b, -1, self.heads, d).transpose(1, 2)

            q, k, v = split(q), split(k), split(v)
            q = torch.cat([q[:, :, :1], self._rope(q[:, :, 1:], gh, gw)], dim=2)
            k = torch.cat([k[:, :, :1], self._rope(k[:, :, 1:], gh, gw)], dim=2)
            attn = torch.softmax(q @ k.transpose(-1, -2) * d ** -0.5, dim=-1)
            o = (attn @ v).transpose(1, 2).reshape(b, -1, self.dim)
            x = x + blk.attn.out_proj(o)
            h = blk.ln_2(x)
            x = x + blk.mlp.c_proj(
                torch.nn.functional.gelu(blk.mlp.c_fc(h))
            )
        x = self.ln_post(x)
        return x[:, 1:].reshape(b, gh, gw, self.dim)


def test_vit_matches_pe_reference():
    """PE-Core/PE-Spatial conversion + forward parity vs the torch anchor."""
    from naf_tpu.backbones.convert import convert_pe

    torch.manual_seed(5)
    model = _TorchPE()
    model.eval()
    x = np.random.RandomState(6).randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x)).numpy()

    params, cfg = convert_pe(dict(model.state_dict()), num_heads=2)
    assert cfg.rope_style == "interleaved" and cfg.rope_theta == 10000.0
    assert cfg.ln_pre and not cfg.patch_bias and cfg.use_abs_pos
    got = ViT(cfg).apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-4)

    # auto-detection routes resblocks-naming to convert_pe
    from naf_tpu.backbones.convert import vit_from_torch

    params2, cfg2 = vit_from_torch(dict(model.state_dict()), num_heads=2)
    assert cfg2 == cfg


def test_pe_wrapper_registry_contract():
    """vit_wrapper.py:30-33 PE names: NCHW-contract feature maps, 0.5 norm."""
    from naf_tpu.backbones import PretrainedViTWrapper

    w = PretrainedViTWrapper("vit_pe_core_small_patch16_384.fb", num_heads=6)
    assert w.patch_size == 16 and w.embed_dim == 384
    assert w.config["mean"] == (0.5, 0.5, 0.5)
    feats = w(jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert feats.shape == (1, 4, 4, 384)

    w2 = PretrainedViTWrapper("vit_pe_spatial_tiny_patch16_512.fb", num_heads=3)
    assert w2.embed_dim == 192 and w2.config["input_size"] == (3, 512, 512)
    feats2 = w2(jnp.zeros((1, 32, 32, 3), jnp.float32))
    assert feats2.shape == (1, 2, 2, 192)
