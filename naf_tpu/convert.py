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

Strict accounting: every checkpoint key must be consumed by the conversion
(or verified, for the recomputed `rope.periods` buffer) — an unconsumed key
means the released checkpoint carries a weight this converter would silently
drop, and raises instead.
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


def naf_params_from_torch(
    state: Mapping | str,
    img_layers: int = 2,
    rope_base: float | None = 100.0,
    strict: bool = True,
) -> dict:
    """Convert a reference-NAF state dict (or .pth path) to flax params.

    The reference module tree (src/model/naf.py:72-102) has learnable weights
    only in the two image-encoder conv stacks; `image_encoder.rope.periods`
    is a persistent buffer that naf_tpu recomputes from rope_base — here it
    is VERIFIED against the checkpoint value (src/layers/rope.py:128-135;
    d_head inferred from the buffer length, periods[i] = base^(2i/(d_head/2))
    for i < d_head/4). With strict=True (default), any checkpoint key not
    consumed by the conversion raises KeyError — catching released-checkpoint
    keys this converter would otherwise silently drop.
    """
    if isinstance(state, str):
        import torch

        state = torch.load(state, map_location="cpu", weights_only=True)
    if "state_dict" in state and not any("encoder" in k for k in state):
        state = state["state_dict"]

    consumed: set = set()
    tracked = _KeyTracker(state, consumed)

    image_encoder = {
        "encoder": convert_encoder(tracked, "image_encoder.encoder", img_layers),
        "sem_encoder": convert_encoder(
            tracked, "image_encoder.sem_encoder", img_layers
        ),
    }

    periods_key = "image_encoder.rope.periods"
    if periods_key in state:
        got = _to_numpy(state[periods_key]).astype(np.float32)
        n = got.shape[0]  # == d_head // 4
        if rope_base is None:  # logspace variant is not used by the release
            raise ValueError("rope_base=None checkpoints need min/max periods")
        want = rope_base ** (np.arange(n, dtype=np.float32) / n)
        if not np.allclose(got, want, rtol=1e-4):
            raise ValueError(
                f"checkpoint rope.periods does not match base={rope_base}: "
                f"{got} vs {want}"
            )
        consumed.add(periods_key)

    if strict:
        leftover = sorted(set(state) - consumed)
        if leftover:
            raise KeyError(
                "checkpoint keys not consumed by the converter (would be "
                f"silently dropped): {leftover}"
            )
    return {"image_encoder": image_encoder}


class _KeyTracker:
    """Mapping view that records which checkpoint keys the conversion read."""

    def __init__(self, state: Mapping, consumed: set):
        self._state = state
        self._consumed = consumed

    def __getitem__(self, key):
        self._consumed.add(key)
        return self._state[key]

    def __contains__(self, key):
        return key in self._state
