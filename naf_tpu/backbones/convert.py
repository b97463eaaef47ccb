"""Pretrained ViT weight conversion: HF transformers / timm -> naf_tpu.ViT.

Supports the checkpoint layouts that cover the reference MODEL_LIST families
(src/backbone/vit_wrapper.py:15-40): timm VisionTransformer state dicts
(DINO, DINOv2 via timm, MAE, SigLIP-style trunks) and HuggingFace
Dinov2Model / Dinov2WithRegistersModel. Configs are inferred from tensor
shapes, so converted models match without manual arch bookkeeping.
"""

from __future__ import annotations

import math
from typing import Mapping, Tuple

import numpy as np

from naf_tpu.backbones.vit import ViTConfig

__all__ = [
    "convert_timm_vit",
    "convert_hf_dinov2",
    "convert_hf_dinov3",
    "convert_radio",
    "convert_franca",
    "convert_capi",
    "convert_pe",
    "vit_from_torch",
]


def _np(t):
    return t if isinstance(t, np.ndarray) else t.detach().cpu().numpy()


def _attn_from_qkv(qkv_w, qkv_b, proj_w, proj_b, num_heads):
    c = qkv_w.shape[1]
    d = c // num_heads
    return {
        "qkv": {
            "kernel": qkv_w.T.reshape(c, 3, num_heads, d),
            "bias": qkv_b.reshape(3, num_heads, d),
        },
        "proj": {
            "kernel": proj_w.T.reshape(num_heads, d, c),
            "bias": proj_b,
        },
    }


def _ln(state, prefix):
    return {"scale": _np(state[f"{prefix}.weight"]), "bias": _np(state[f"{prefix}.bias"])}


def convert_timm_vit(state: Mapping, num_heads: int) -> Tuple[dict, ViTConfig]:
    """timm VisionTransformer state dict -> (flax params, config)."""
    pe_w = _np(state["patch_embed.proj.weight"])  # (C, 3, ps, ps)
    c, _, ps, _ = pe_w.shape
    pos = _np(state["pos_embed"])
    depth = 1 + max(
        int(k.split(".")[1]) for k in state if k.startswith("blocks.")
    )
    n_reg = _np(state["reg_token"]).shape[1] if "reg_token" in state else 0
    # timm pos_embed covers cls+patches only (registers are pos-free):
    # an odd token count means a cls position is present.
    has_cls_pos = pos.shape[1] % 2 == 1
    grid = int(math.isqrt(pos.shape[1] - (1 if has_cls_pos else 0)))
    fc1 = _np(state["blocks.0.mlp.fc1.weight"])
    cfg = ViTConfig(
        patch_size=ps,
        embed_dim=c,
        depth=depth,
        num_heads=num_heads,
        mlp_ratio=fc1.shape[0] / c,
        num_reg_tokens=n_reg,
        layerscale="blocks.0.ls1.gamma" in state,
        pos_grid=grid,
        use_cls_pos=has_cls_pos,
    )

    params = {
        "patch_embed": {"kernel": pe_w.transpose(2, 3, 1, 0), "bias": _np(state["patch_embed.proj.bias"])},
        "pos_embed": pos,
        "cls_token": _np(state["cls_token"]),
        "norm": _ln(state, "norm"),
    }
    if n_reg:
        params["reg_tokens"] = _np(state["reg_token"])
    for i in range(depth):
        p = f"blocks.{i}"
        blk = {
            "norm1": _ln(state, f"{p}.norm1"),
            "attn": _attn_from_qkv(
                _np(state[f"{p}.attn.qkv.weight"]),
                _np(state[f"{p}.attn.qkv.bias"]),
                _np(state[f"{p}.attn.proj.weight"]),
                _np(state[f"{p}.attn.proj.bias"]),
                num_heads,
            ),
            "norm2": _ln(state, f"{p}.norm2"),
            "fc1": {"kernel": _np(state[f"{p}.mlp.fc1.weight"]).T, "bias": _np(state[f"{p}.mlp.fc1.bias"])},
            "fc2": {"kernel": _np(state[f"{p}.mlp.fc2.weight"]).T, "bias": _np(state[f"{p}.mlp.fc2.bias"])},
        }
        if cfg.layerscale:
            blk["ls1"] = _np(state[f"{p}.ls1.gamma"])
            blk["ls2"] = _np(state[f"{p}.ls2.gamma"])
        params[f"block{i}"] = blk
    return params, cfg


def convert_hf_dinov2(state: Mapping, num_heads: int) -> Tuple[dict, ViTConfig]:
    """HF Dinov2Model / Dinov2WithRegistersModel state dict -> (params, config)."""
    pe_w = _np(state["embeddings.patch_embeddings.projection.weight"])
    c, _, ps, _ = pe_w.shape
    pos = _np(state["embeddings.position_embeddings"])
    depth = 1 + max(
        int(k.split(".")[2]) for k in state if k.startswith("encoder.layer.")
    )
    n_reg = (
        _np(state["embeddings.register_tokens"]).shape[1]
        if "embeddings.register_tokens" in state
        else 0
    )
    grid = int(math.isqrt(pos.shape[1] - 1))
    fc1 = _np(state["encoder.layer.0.mlp.fc1.weight"])
    cfg = ViTConfig(
        patch_size=ps,
        embed_dim=c,
        depth=depth,
        num_heads=num_heads,
        mlp_ratio=fc1.shape[0] / c,
        num_reg_tokens=n_reg,
        layerscale="encoder.layer.0.layer_scale1.lambda1" in state,
        pos_grid=grid,
        use_cls_pos=True,
    )

    params = {
        "patch_embed": {
            "kernel": pe_w.transpose(2, 3, 1, 0),
            "bias": _np(state["embeddings.patch_embeddings.projection.bias"]),
        },
        "pos_embed": pos,
        "cls_token": _np(state["embeddings.cls_token"]),
        "norm": _ln(state, "layernorm"),
    }
    if n_reg:
        params["reg_tokens"] = _np(state["embeddings.register_tokens"])
    d = c // num_heads
    for i in range(depth):
        p = f"encoder.layer.{i}"
        qkv_w = np.concatenate(
            [_np(state[f"{p}.attention.attention.{m}.weight"]) for m in ("query", "key", "value")],
            axis=0,
        )
        qkv_b = np.concatenate(
            [_np(state[f"{p}.attention.attention.{m}.bias"]) for m in ("query", "key", "value")]
        )
        blk = {
            "norm1": _ln(state, f"{p}.norm1"),
            "attn": _attn_from_qkv(
                qkv_w, qkv_b,
                _np(state[f"{p}.attention.output.dense.weight"]),
                _np(state[f"{p}.attention.output.dense.bias"]),
                num_heads,
            ),
            "norm2": _ln(state, f"{p}.norm2"),
            "fc1": {"kernel": _np(state[f"{p}.mlp.fc1.weight"]).T, "bias": _np(state[f"{p}.mlp.fc1.bias"])},
            "fc2": {"kernel": _np(state[f"{p}.mlp.fc2.weight"]).T, "bias": _np(state[f"{p}.mlp.fc2.bias"])},
        }
        if cfg.layerscale:
            blk["ls1"] = _np(state[f"{p}.layer_scale1.lambda1"])
            blk["ls2"] = _np(state[f"{p}.layer_scale2.lambda1"])
        params[f"block{i}"] = blk
    return params, cfg


def _strip_prefix(state: Mapping, candidates) -> Mapping:
    """Return the sub-dict under the first prefix that exposes a ViT trunk
    (timm-style ``blocks.N.`` keys), dropping keys outside it."""
    for pre in candidates:
        sub = {
            k[len(pre):]: v for k, v in state.items() if k.startswith(pre)
        }
        if any(k.startswith("blocks.") for k in sub):
            return sub
    raise ValueError(
        f"no ViT trunk found under any of the prefixes {list(candidates)}"
    )


_TRUNK_KEY_ALIASES = {
    # family-specific names for the same tensors (timm canonical on the left)
    "reg_token": ("register_tokens", "storage_tokens"),
}


def _canonicalize_trunk(sub: dict) -> dict:
    out = dict(sub)
    for canon, aliases in _TRUNK_KEY_ALIASES.items():
        if canon not in out:
            for alias in aliases:
                if alias in out:
                    out[canon] = out.pop(alias)
                    break
    return out


def convert_radio(state: Mapping, num_heads: int) -> Tuple[dict, ViTConfig]:
    """NVlabs/RADIO hub checkpoint -> (trunk params, config).

    RADIO wraps a timm-style VisionTransformer (under ``model.`` /
    ``radio_model.model.`` / ``base_model.model.`` depending on how the hub
    module was saved) together with an input conditioner, summary heads, and
    task adaptors. The reference wrapper consumes only the trunk's spatial
    features (vit_wrapper.py:97-109, 139-180), so summary/adaptor weights
    are intentionally dropped; the conditioner's mean/std of (0, 1) is
    handled by the backbone registry, matching vit_wrapper.py:102-106."""
    sub = _strip_prefix(
        state, ("radio_model.model.", "base_model.model.", "model.", "")
    )
    return convert_timm_vit(_canonicalize_trunk(sub), num_heads)


def convert_capi(state: Mapping, num_heads: int) -> Tuple[dict, ViTConfig]:
    """facebookresearch/capi hub checkpoint -> (trunk params, config).

    CAPI's encoder is a registers ViT with timm-lineage naming (the hub
    model returns NHWC patch features directly, vit_wrapper.py:167-169);
    register tokens may appear as ``storage_tokens``."""
    sub = _strip_prefix(state, ("backbone.", "encoder.", "teacher.", ""))
    return convert_timm_vit(_canonicalize_trunk(sub), num_heads)


def convert_franca(state: Mapping, num_heads: int):
    """valeoai/Franca hub checkpoint -> (trunk params, config, rasa params).

    Franca is DINOv2-lineage (timm-style trunk keys); the wrapper consumes
    ``patch_token_rasa`` — patch tokens passed through the RASA head
    (vit_wrapper.py:111-113, 161-165). The RASA head converts as an ordered
    stack of linear layers applied per token (layer keys matched by the
    ``rasa`` fragment); the stack's hidden activation follows the published
    head (GELU between layers). Raises if no RASA tensors are present so a
    hub-layout change is loud."""
    sub = _strip_prefix(state, ("backbone.", "teacher.backbone.", ""))
    trunk_keys = {k for k in sub if "rasa" not in k.lower()}
    params, cfg = convert_timm_vit(
        _canonicalize_trunk({k: sub[k] for k in trunk_keys}), num_heads
    )
    rasa_w = sorted(
        k for k in sub if "rasa" in k.lower() and k.endswith(".weight")
        and _np(sub[k]).ndim == 2
    )
    if not rasa_w:
        raise ValueError("no RASA head tensors found in Franca checkpoint")
    rasa = {}
    for i, wk in enumerate(rasa_w):
        bk = wk[: -len(".weight")] + ".bias"
        rasa[f"linear{i}"] = {
            "kernel": _np(sub[wk]).T,
            "bias": _np(sub[bk]) if bk in sub
            else np.zeros(_np(sub[wk]).shape[0], np.float32),
        }
    return params, cfg, rasa


def convert_pe(state: Mapping, num_heads: int) -> Tuple[dict, ViTConfig]:
    """Meta Perception Encoder (PE-Core / PE-Spatial) -> (params, config).

    The reference lists `vit_pe_core_small_patch16_384.fb` and
    `vit_pe_spatial_tiny_patch16_512.fb` (src/backbone/vit_wrapper.py:30-33);
    released checkpoints keep the CLIP-lineage naming of
    facebookresearch/perception_models (conv1 / class_embedding /
    positional_embedding / ln_pre / transformer.resblocks.N.{ln_1, attn
    in_proj, attn.out_proj, ln_2, mlp.c_fc, mlp.c_proj} / ln_post).
    Architecture: bias-free patchify, pre-LN transformer, learned absolute
    positions PLUS per-block interleaved Rope2D (theta 10000). PE-Core's
    CLIP head (attn_pool / proj / logit_scale) is dropped — the wrapper
    consumes spatial patch tokens only (vit_wrapper.py:139-180)."""
    pe_w = _np(state["conv1.weight"])  # (C, 3, ps, ps), no bias
    c, _, ps, _ = pe_w.shape
    pos = _np(state["positional_embedding"])  # (1 + grid^2, C) incl. cls
    depth = 1 + max(
        int(k.split(".")[2]) for k in state
        if k.startswith("transformer.resblocks.")
    )
    grid = int(math.isqrt(pos.shape[0] - 1))
    fc1 = _np(state["transformer.resblocks.0.mlp.c_fc.weight"])
    cfg = ViTConfig(
        patch_size=ps,
        embed_dim=c,
        depth=depth,
        num_heads=num_heads,
        mlp_ratio=fc1.shape[0] / c,
        layerscale="transformer.resblocks.0.ls_1.gamma" in state,
        ln_eps=1e-5,
        pos_grid=grid,
        use_cls_pos=True,
        rope_theta=10000.0,
        rope_style="interleaved",
        use_abs_pos=True,
        ln_pre=True,
        patch_bias=False,
    )
    params = {
        "patch_embed": {"kernel": pe_w.transpose(2, 3, 1, 0)},
        "pos_embed": pos[None],
        "cls_token": _np(state["class_embedding"]).reshape(1, 1, c),
        "norm_pre": _ln(state, "ln_pre"),
        "norm": _ln(state, "ln_post"),
    }
    for i in range(depth):
        p = f"transformer.resblocks.{i}"
        blk = {
            "norm1": _ln(state, f"{p}.ln_1"),
            "attn": _attn_from_qkv(
                _np(state[f"{p}.attn.in_proj_weight"]),
                _np(state[f"{p}.attn.in_proj_bias"]),
                _np(state[f"{p}.attn.out_proj.weight"]),
                _np(state[f"{p}.attn.out_proj.bias"]),
                num_heads,
            ),
            "norm2": _ln(state, f"{p}.ln_2"),
            "fc1": {"kernel": _np(state[f"{p}.mlp.c_fc.weight"]).T,
                    "bias": _np(state[f"{p}.mlp.c_fc.bias"])},
            "fc2": {"kernel": _np(state[f"{p}.mlp.c_proj.weight"]).T,
                    "bias": _np(state[f"{p}.mlp.c_proj.bias"])},
        }
        if cfg.layerscale:
            blk["ls1"] = _np(state[f"{p}.ls_1.gamma"])
            blk["ls2"] = _np(state[f"{p}.ls_2.gamma"])
        params[f"block{i}"] = blk
    return params, cfg


def vit_from_torch(state: Mapping, num_heads: int) -> Tuple[dict, ViTConfig]:
    """Auto-detect the checkpoint family and convert."""
    if any(k.startswith("encoder.layer.") for k in state):
        return convert_hf_dinov2(state, num_heads)
    if any(k.startswith("layer.") and "attention.q_proj" in k for k in state):
        return convert_hf_dinov3(state, num_heads)
    if any(k.startswith("transformer.resblocks.") for k in state):
        return convert_pe(state, num_heads)
    if any(k.startswith("blocks.") for k in state):
        return convert_timm_vit(_canonicalize_trunk(dict(state)), num_heads)
    # wrapped trunks (RADIO-style nesting)
    try:
        sub = _strip_prefix(
            state,
            ("radio_model.model.", "base_model.model.", "model.",
             "backbone.", "encoder."),
        )
        return convert_timm_vit(_canonicalize_trunk(sub), num_heads)
    except ValueError:
        pass
    raise ValueError("unrecognized ViT checkpoint layout")


def convert_hf_dinov3(state: Mapping, num_heads: int, rope_theta: float = 100.0):
    """HF DINOv3ViTModel state dict -> (flax params, config).

    DINOv3: per-block rotary embeddings (no learned positions), separate
    q/k/v projections (k without bias), plain-MLP up/down naming.
    """
    pe_w = _np(state["embeddings.patch_embeddings.weight"])
    c, _, ps, _ = pe_w.shape
    depth = 1 + max(int(k.split(".")[1]) for k in state if k.startswith("layer."))
    n_reg = _np(state["embeddings.register_tokens"]).shape[1]
    fc1 = _np(state["layer.0.mlp.up_proj.weight"])
    cfg = ViTConfig(
        patch_size=ps,
        embed_dim=c,
        depth=depth,
        num_heads=num_heads,
        mlp_ratio=fc1.shape[0] / c,
        num_reg_tokens=n_reg,
        layerscale=True,
        ln_eps=1e-5,
        rope_theta=rope_theta,
        use_cls_pos=False,
    )

    params = {
        "patch_embed": {
            "kernel": pe_w.transpose(2, 3, 1, 0),
            "bias": _np(state["embeddings.patch_embeddings.bias"]),
        },
        "cls_token": _np(state["embeddings.cls_token"]),
        "norm": _ln(state, "norm"),
    }
    if n_reg:
        params["reg_tokens"] = _np(state["embeddings.register_tokens"])
    d = c // num_heads
    for i in range(depth):
        p = f"layer.{i}"
        qkv_w = np.concatenate(
            [_np(state[f"{p}.attention.{m}_proj.weight"]) for m in ("q", "k", "v")],
            axis=0,
        )
        qkv_b = np.concatenate(
            [
                _np(state[f"{p}.attention.{m}_proj.bias"])
                if f"{p}.attention.{m}_proj.bias" in state
                else np.zeros(c, np.float32)
                for m in ("q", "k", "v")
            ]
        )
        params[f"block{i}"] = {
            "norm1": _ln(state, f"{p}.norm1"),
            "attn": _attn_from_qkv(
                qkv_w, qkv_b,
                _np(state[f"{p}.attention.o_proj.weight"]),
                _np(state[f"{p}.attention.o_proj.bias"]),
                num_heads,
            ),
            "norm2": _ln(state, f"{p}.norm2"),
            "fc1": {"kernel": _np(state[f"{p}.mlp.up_proj.weight"]).T,
                    "bias": _np(state[f"{p}.mlp.up_proj.bias"])},
            "fc2": {"kernel": _np(state[f"{p}.mlp.down_proj.weight"]).T,
                    "bias": _np(state[f"{p}.mlp.down_proj.bias"])},
            "ls1": _np(state[f"{p}.layer_scale1.lambda1"]),
            "ls2": _np(state[f"{p}.layer_scale2.lambda1"]),
        }
    return params, cfg
