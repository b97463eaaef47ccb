"""PyTorch checkpoint -> flax params conversion for NAF.

Maps the reference NAF state dict (the released `naf_release.pth`, loaded at
hubconf.py:20-24; module tree defined in src/model/naf.py:72-102 and
src/layers/convolutions.py:67-92) to the naf_tpu.models.NAF param pytree.

Layout conversions:
- Conv2d weight (O, I, kh, kw) -> flax Conv kernel (kh, kw, I, O)
- GroupNorm weight/bias (C,)   -> GroupNorm scale/bias
- rope.periods buffer          -> recomputed constant (verified, not stored)

Accepts either a path to a torch .pth file or an already-loaded mapping of
name -> array (torch tensors or numpy).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

__all__ = ["naf_params_from_torch", "convert_conv", "convert_groupnorm"]


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor (avoid importing torch unless needed)
    return t.detach().cpu().numpy()


def convert_conv(state: Mapping, prefix: str) -> dict:
    out = {"kernel": _to_numpy(state[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in state:
        out["bias"] = _to_numpy(state[f"{prefix}.bias"])
    return {"conv": out}


def convert_groupnorm(state: Mapping, prefix: str) -> dict:
    return {
        "scale": _to_numpy(state[f"{prefix}.weight"]),
        "bias": _to_numpy(state[f"{prefix}.bias"]),
    }


def convert_encoder(state: Mapping, prefix: str, num_layers: int) -> dict:
    """Reference `encoder()` Sequential: index 0 = entry conv, 1.. = EncBlocks."""
    dot = f"{prefix}." if prefix else ""
    tree = {"stem": convert_conv(state, f"{dot}0")}
    for i in range(num_layers):
        t = f"{dot}{i + 1}"
        block = {
            "norm1": convert_groupnorm(state, f"{t}.norm1"),
            "conv1": convert_conv(state, f"{t}.conv1"),
            "norm2": convert_groupnorm(state, f"{t}.norm2"),
            "conv2": convert_conv(state, f"{t}.conv2"),
        }
        if f"{t}.shortcut.weight" in state:
            block["shortcut"] = convert_conv(state, f"{t}.shortcut")
        tree[f"block{i}"] = block
    return tree


def naf_params_from_torch(state: Mapping | str, img_layers: int = 2) -> dict:
    """Convert a reference-NAF state dict (or .pth path) to flax params."""
    if isinstance(state, str):
        import torch

        state = torch.load(state, map_location="cpu", weights_only=True)
    if "state_dict" in state and not any("encoder" in k for k in state):
        state = state["state_dict"]

    image_encoder = {
        "encoder": convert_encoder(state, "image_encoder.encoder", img_layers),
        "sem_encoder": convert_encoder(state, "image_encoder.sem_encoder", img_layers),
    }
    return {"image_encoder": image_encoder}
