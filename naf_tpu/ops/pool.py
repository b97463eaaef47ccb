"""Adaptive average pooling with exact torch `F.adaptive_avg_pool2d` semantics.

Used by the NAF image encoder (reference: src/model/naf.py:34) and key
encoder (src/model/naf.py:68). Torch's rule per output cell ``o`` over an axis
of length ``n`` pooled to ``m``: average input ``[floor(o*n/m), ceil((o+1)*n/m))``.

TPU-first design: the general case is expressed as two small static pooling
matrices applied with einsum (MXU work, no gathers); the divisible case takes
a reshape-mean fast path (pure VPU reduction, fused by XLA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["adaptive_avg_pool2d"]


@functools.lru_cache(maxsize=256)
def _pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) averaging matrix for one axis, torch adaptive-pool rule."""
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    for o in range(out_size):
        start = (o * in_size) // out_size
        end = -((-(o + 1) * in_size) // out_size)  # ceil
        mat[o, start:end] = 1.0 / (end - start)
    return mat


def adaptive_avg_pool2d(x: jnp.ndarray, output_size: tuple[int, int]) -> jnp.ndarray:
    """Adaptive average pool of an NHWC (or ...HWC) array to ``output_size``."""
    h_out, w_out = int(output_size[0]), int(output_size[1])
    h_in, w_in = x.shape[-3], x.shape[-2]
    if (h_in, w_in) == (h_out, w_out):
        return x

    compute_dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    x = x.astype(compute_dtype)

    if x.dtype == jnp.bfloat16:
        # bf16 path: pooling matrices on the MXU (f32 accumulation). ~4x
        # faster than XLA's strided reduce at 2K^2 (one matmul pass per
        # axis); the 1/len weights round to bf16, which is exact for
        # power-of-two strides and far below bf16 noise otherwise.
        if h_in != h_out:
            ph = jnp.asarray(_pool_matrix(h_in, h_out), jnp.bfloat16)
            x = jnp.einsum("oh,...hwc->...owc", ph, x)
        if w_in != w_out:
            pw = jnp.asarray(_pool_matrix(w_in, w_out), jnp.bfloat16)
            x = jnp.einsum("ow,...hwc->...hoc", pw, x)
        return x

    if h_in % h_out == 0 and w_in % w_out == 0:
        # Fast path: plain strided mean.
        sh, sw = h_in // h_out, w_in // w_out
        lead = x.shape[:-3]
        x = x.reshape(*lead, h_out, sh, w_in, x.shape[-1])
        x = x.mean(axis=-3)
        x = x.reshape(*lead, h_out, w_out, sw, x.shape[-1])
        return x.mean(axis=-2)

    # HIGHEST: the default (fast, bf16-ish) matmul precision would break the
    # exact torch-parity contract of this op.
    if h_in != h_out:
        ph = jnp.asarray(_pool_matrix(h_in, h_out), dtype=compute_dtype)
        x = jnp.einsum("oh,...hwc->...owc", ph, x, precision=jax.lax.Precision.HIGHEST)
    if w_in != w_out:
        pw = jnp.asarray(_pool_matrix(w_in, w_out), dtype=compute_dtype)
        x = jnp.einsum("ow,...hwc->...hoc", pw, x, precision=jax.lax.Precision.HIGHEST)
    return x
