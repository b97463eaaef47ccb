"""Training losses (reference src/loss.py:7-45).

`Loss(loss_type)` returns a callable producing {"total": scalar}; only "mse"
exists in the reference. The optional min-max normalization branch normalizes
pred and target by the target's per-position channel range (torch dim=1 ==
NHWC channel axis here).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["mse_loss", "Loss"]


def mse_loss(pred, target, normalize: bool = False):
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if normalize:
        t_min = jnp.min(target, axis=-1, keepdims=True)
        t_max = jnp.max(target, axis=-1, keepdims=True)
        denom = t_max - t_min + 1e-6
        pred = (pred - t_min) / denom
        target = (target - t_min) / denom
    return jnp.mean((pred - target) ** 2)


class Loss:
    """Reference Loss wrapper: returns {"total": loss} (src/loss.py:26-45)."""

    def __init__(self, loss_type: str = "mse", dim: int = 384):
        if loss_type != "mse":
            raise NotImplementedError(f"Loss type {loss_type} not implemented")
        self.dim = dim

    def __call__(self, pred, target, normalize: bool = False):
        return {"total": mse_loss(pred, target, normalize=normalize)}
