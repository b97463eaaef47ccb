"""Neighborhood-attention oracle tests.

Cross-checks three independently-derived paths:
1. a per-query numpy brute force (direct definition of clamped dilated NA),
2. the dense gather/einsum `na2d`,
3. the LR-direct `cross_scale_na2d` vs nearest-exact-upsample + dense `na2d`
   (the literal reference pipeline, src/layers/attentions.py:48-72).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from naf_tpu.ops import cross_scale_na2d, na2d, resize_nearest_exact
from naf_tpu.ops.window import na_window_start


def brute_force_na2d(q, k, v, kernel, dilation, scale):
    """Direct per-query loop over clamped dilated windows (numpy, float64)."""
    b, h, w, n, d = q.shape
    kh, kw = kernel
    dh, dw = dilation
    out = np.zeros_like(q, dtype=np.float64)
    q64, k64, v64 = q.astype(np.float64), k.astype(np.float64), v.astype(np.float64)
    for i in range(h):
        si = int(na_window_start(np.array(i), h, kh, dh))
        rows = si + dh * np.arange(kh)
        for j in range(w):
            sj = int(na_window_start(np.array(j), w, kw, dw))
            cols = sj + dw * np.arange(kw)
            kw_win = k64[:, rows][:, :, cols]  # (b, kh, kw, n, d)
            vw_win = v64[:, rows][:, :, cols]
            logits = np.einsum("bnd,btsnd->bnts", q64[:, i, j] * scale, kw_win)
            logits = logits.reshape(b, n, kh * kw)
            wgt = np.exp(logits - logits.max(-1, keepdims=True))
            wgt /= wgt.sum(-1, keepdims=True)
            out[:, i, j] = np.einsum(
                "bnt,btnd->bnd", wgt, vw_win.reshape(b, kh * kw, n, d)
            )
    return out


def _rand(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


@pytest.mark.parametrize("h,w,kernel,dilation", [
    (12, 12, (5, 5), (1, 1)),
    (15, 12, (3, 5), (1, 2)),
    (20, 20, (5, 5), (4, 4)),
    (21, 20, (3, 3), (7, 4)),
])
def test_na2d_matches_brute_force(h, w, kernel, dilation):
    b, n, d = 2, 2, 8
    q = _rand(b, h, w, n, d, seed=1)
    k = _rand(b, h, w, n, d, seed=2)
    v = _rand(b, h, w, n, d, seed=3)
    scale = d ** -0.5
    ref = brute_force_na2d(q, k, v, kernel, dilation, scale)
    got = na2d(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), kernel, dilation)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


@pytest.mark.parametrize("hq,wq,hk,wk,kernel", [
    (48, 48, 12, 12, 5),   # exact ratio 4
    (96, 64, 12, 8, 7),    # exact ratio 8
    (100, 90, 13, 11, 5),  # ragged ratios (7x, 8x truncated)
    (24, 24, 24, 24, 5),   # ratio 1 (no upsampling)
])
def test_cross_scale_equals_reference_pipeline(hq, wq, hk, wk, kernel):
    """LR-direct gather == nearest-exact upsample + dilated dense NA."""
    b, n, d = 1, 2, 8
    q = _rand(b, hq, wq, n, d, seed=4)
    k_lr = _rand(b, hk, wk, n, d, seed=5)
    v_lr = _rand(b, hk, wk, n, d, seed=6)

    got = cross_scale_na2d(jnp.asarray(q), jnp.asarray(k_lr), jnp.asarray(v_lr), kernel)

    # Literal reference pipeline: upsample K/V (nearest-exact) then dense NA.
    def ups(x):
        flat = x.reshape(b, hk, wk, n * d)
        up = resize_nearest_exact(flat, (hq, wq))
        return up.reshape(b, hq, wq, n, d)

    dilation = (hq // hk, wq // wk)
    ref = na2d(jnp.asarray(q), ups(jnp.asarray(k_lr)), ups(jnp.asarray(v_lr)),
               kernel, dilation)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_return_weights_shape_and_softmax_consistency():
    b, n, d, hq, wq, hk, wk, kernel = 1, 2, 8, 20, 20, 10, 10, 3
    q = jnp.asarray(_rand(b, hq, wq, n, d, seed=7))
    k = jnp.asarray(_rand(b, hk, wk, n, d, seed=8))
    v = jnp.asarray(_rand(b, hk, wk, n, d, seed=9))
    out, scores = cross_scale_na2d(q, k, v, kernel, return_weights=True)
    # reference returns scaled pre-softmax scores (B, heads, H, W, k*k)
    assert scores.shape == (b, n, hq, wq, kernel * kernel)
    out2 = cross_scale_na2d(q, k, v, kernel)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)
