"""Cross-scale neighborhood attention layer (reference CrossAttention,
src/layers/attentions.py:32-75), NHWC.

Queries live on the output (H, W) grid, keys/values on the low-res (h, w)
VFM grid. Attention windows are k x k dilated neighborhoods with dilation
equal to the scale ratio; we gather them directly from the LR grid (see
naf_tpu.ops.na2d) instead of nearest-exact-upsampling K/V like the reference.

Implementations:
- "pallas": fused TPU kernel (exact integer ratios; the production path)
- "xla":    gather + einsum oracle (any ratio, supports return_weights)
- "auto":   pallas when applicable on TPU, else xla
"""

from __future__ import annotations

import jax
from flax import linen as nn

from naf_tpu.ops.na2d import cross_scale_na2d

__all__ = ["CrossScaleAttention"]


def _pallas_applicable(q, k, v, kernel_size):
    from naf_tpu.kernels.na2d_fused import fused_applicable

    hq, wq = q.shape[1], q.shape[2]
    hk, wk = k.shape[1], k.shape[2]
    return (
        fused_applicable(
            hq, wq, hk, wk, kernel_size,
            n=q.shape[3], d=q.shape[4], dv=v.shape[-1],
            itemsize=q.dtype.itemsize,
        )
        and jax.default_backend() == "tpu"
    )


class CrossScaleAttention(nn.Module):
    """num_heads-way cross-scale NA; no learnable parameters.

    dim is the query/key channel count; value channels are independent
    (raw VFM features) and only need divisibility by num_heads.
    """

    dim: int
    num_heads: int
    kernel_size: int = 9
    impl: str = "auto"  # "auto" | "pallas" | "xla"

    def __call__(
        self, q, k, v, return_weights: bool = False,
        row_cell0: int = 0, full_hq=None,
    ):
        """row_cell0/full_hq: banded execution — q holds query rows starting
        at LR cell row_cell0 of a full_hq-tall grid (pallas impl only)."""
        if self.dim % self.num_heads != 0:
            raise ValueError("dim must be divisible by num_heads")
        if v.shape[-1] % self.num_heads != 0:
            raise ValueError("value channels must be divisible by num_heads")
        b, hq, wq, _ = q.shape
        hk, wk = k.shape[1], k.shape[2]
        n = self.num_heads
        d = self.dim // n
        dv = v.shape[-1] // n
        scale = d ** -0.5
        banded = row_cell0 != 0 or (full_hq is not None and full_hq != hq)

        qh = q.reshape(b, hq, wq, n, d)
        kh = k.reshape(b, hk, wk, n, d)
        vh = v.reshape(b, hk, wk, n, dv)

        impl = self.impl
        if impl == "auto":
            full = full_hq if full_hq is not None else hq
            impl = (
                "pallas"
                if not return_weights
                and _pallas_applicable(
                    jax.ShapeDtypeStruct((b, full, wq, n, d), q.dtype),
                    kh, vh, self.kernel_size,
                )
                else "xla"
            )

        if impl == "pallas":
            from naf_tpu.kernels.na2d_fused import cross_scale_na2d_fused

            out = cross_scale_na2d_fused(
                qh, kh, vh, self.kernel_size, scale=scale,
                row_cell0=row_cell0, full_hq=full_hq,
            )
            return out.reshape(b, hq, wq, n * dv)

        if banded:
            raise NotImplementedError("banded attention requires the pallas impl")
        if return_weights:
            out, weights = cross_scale_na2d(
                qh, kh, vh, self.kernel_size, scale=scale, return_weights=True
            )
            return out.reshape(b, hq, wq, n * dv), weights
        out = cross_scale_na2d(qh, kh, vh, self.kernel_size, scale=scale)
        return out.reshape(b, hq, wq, n * dv)
