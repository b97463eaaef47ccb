"""Pure-JAX 2-D neighborhood attention (oracle + XLA fallback path).

Two entry points:

- :func:`na2d`: dense dilated neighborhood attention with exact natten
  semantics (the reference's device kernel, src/layers/attentions.py:16-29,72).
  Q/K/V all live on the same (H, W) grid. Used as the numerical oracle for
  the fused Pallas kernel and for `return_weights` introspection parity
  (reference notebooks/attention_maps.ipynb capability).

- :func:`cross_scale_na2d`: the NAF-specific composition — K/V live on a
  low-res (h, w) grid; the reference nearest-exact-upsamples them to (H, W)
  and runs na2d with dilation (H//h, W//w) (src/layers/attentions.py:48-61).
  We compose the two index maps and gather straight from the LR grid instead,
  which never materializes the upsampled K/V. Identical outputs.

Layouts are TPU-native channels-last: Q is (B, H, W, heads, d), K/V are
(B, h, w, heads, d). Softmax/logits accumulate in float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from naf_tpu.ops.window import cross_scale_lr_indices, na_gather_indices

__all__ = ["na2d", "cross_scale_na2d"]


def _na2d_from_indices(q, k, v, idx_h, idx_w, scale, return_weights):
    """Shared core: attend each query (i, j) to k[idx_h[i,t], idx_w[j,s]]."""
    idx_h = jnp.asarray(idx_h)
    idx_w = jnp.asarray(idx_w)
    qf = q.astype(jnp.float32) * jnp.float32(scale)

    # Gather K/V windows: (B, H, kh, W, kw, n, d)
    kg = jnp.take(k, idx_h, axis=1)
    kg = jnp.take(kg, idx_w, axis=3)
    vg = jnp.take(v, idx_h, axis=1)
    vg = jnp.take(vg, idx_w, axis=3)

    logits = jnp.einsum(
        "bijnd,bitjsnd->bnijts", qf, kg.astype(jnp.float32),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    b, n, h, w, kh, kw = logits.shape
    flat = logits.reshape(b, n, h, w, kh * kw)
    weights = jax.nn.softmax(flat, axis=-1).reshape(b, n, h, w, kh, kw)
    out = jnp.einsum(
        "bnijts,bitjsnd->bijnd", weights, vg.astype(jnp.float32),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    ).astype(q.dtype)
    if return_weights:
        # Reference returns the *scaled pre-softmax* scores, shape
        # (B, heads, H, W, k*k) (src/layers/attentions.py:20-28).
        return out, flat
    return out


def na2d(q, k, v, kernel_size, dilation=(1, 1), scale=None, return_weights=False):
    """Dense dilated 2-D neighborhood attention (natten semantics).

    Args:
      q, k, v: (B, H, W, heads, d) arrays on the same spatial grid.
      kernel_size: int or (kh, kw), odd.
      dilation: int or (dh, dw).
      scale: logit scale; defaults to d**-0.5 (natten default).
    """
    kh, kw = (kernel_size, kernel_size) if isinstance(kernel_size, int) else kernel_size
    dh, dw = (dilation, dilation) if isinstance(dilation, int) else dilation
    if scale is None:
        scale = q.shape[-1] ** -0.5
    h, w = q.shape[1], q.shape[2]
    idx_h = na_gather_indices(h, kh, dh)
    idx_w = na_gather_indices(w, kw, dw)
    return _na2d_from_indices(q, k, v, idx_h, idx_w, scale, return_weights)


def cross_scale_na2d(q, k, v, kernel_size, scale=None, return_weights=False,
                     row_block=None):
    """Cross-scale neighborhood attention: HR queries over LR keys/values.

    Equivalent to nearest-exact upsampling K/V from (h, w) to Q's (H, W) and
    running :func:`na2d` with dilation (H//h, W//w) — the reference
    CrossAttention data path — but gathers windows directly from the LR grid.

    Large query grids are processed in row blocks (lax.map) so the gathered
    K/V windows stay bounded; `row_block=None` picks one automatically
    (~<=256MB of gathered windows per block), `row_block=0` disables
    blocking.

    Args:
      q: (B, H, W, heads, d); k, v: (B, h, w, heads, d).
    """
    kh, kw = (kernel_size, kernel_size) if isinstance(kernel_size, int) else kernel_size
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, hq, wq = q.shape[0], q.shape[1], q.shape[2]
    hk, wk = k.shape[1], k.shape[2]
    idx_h = jnp.asarray(cross_scale_lr_indices(hq, hk, kh))
    idx_w = jnp.asarray(cross_scale_lr_indices(wq, wk, kw))

    if row_block is None:
        win_bytes_per_row = (
            b * wq * kh * kw * q.shape[3] * (q.shape[4] + v.shape[4]) * 4
        )
        limit = 256 * 2 ** 20
        row_block = max(min(limit // max(win_bytes_per_row, 1), hq), 1)
    if row_block and row_block < hq and not return_weights:
        nb = -(-hq // row_block)
        pad = nb * row_block - hq
        q_p = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0)))
        idx_p = jnp.pad(idx_h, ((0, pad), (0, 0)), mode="edge")
        q_bands = q_p.reshape(b, nb, row_block, wq, *q.shape[3:]).swapaxes(0, 1)
        idx_bands = idx_p.reshape(nb, row_block, kh)

        def band(args):
            qb, ib = args
            return _na2d_from_indices(qb, k, v, ib, idx_w, scale, False)

        # remat: without it, reverse-mode through lax.map saves every band's
        # gathered K/V windows as residuals — the full O(H*W*k^2*d) tensor
        # the blocking exists to avoid (AnyUp backward OOM'd at 448^2).
        out = jax.lax.map(jax.checkpoint(band), (q_bands, idx_bands))
        out = out.swapaxes(0, 1).reshape(b, nb * row_block, wq, *out.shape[4:])
        return out[:, :hq]

    return _na2d_from_indices(q, k, v, idx_h, idx_w, scale, return_weights)
