"""Full-NAF golden parity at the reference's production configuration.

The reference ships dim=256, kernel=9 (src/model/naf.py:73-84) and benches
at 448^2 output / 28^2 features / dim 384 / ratio 16 (test/test_utils.py:
16-25). This test drives the SHIPPING API (naf_tpu.api.naf, NCHW contract)
at exactly that configuration against a reference pipeline rebuilt in
torch/numpy:

  torch encoder (tests/reference_modules: reference-source conv stacks +
  RoPE) -> adaptive pools -> tap-looped neighborhood attention computed in
  numpy f64-free f32 (the nearest-exact-upsample + dilation composition,
  src/layers/attentions.py:48-72, collapsed to per-cell windows).

Gate: cosine similarity > 0.999 (the BASELINE.json north star) and tight
absolute error in f32.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from naf_tpu.api import naf, load_naf_params
from naf_tpu.convert import naf_params_from_torch
from tests.test_nn_parity import _TorchImageEncoder, _torch_state_with_prefix

DIM, HEADS, ROPE_HEADS, LAYERS, KERNEL = 256, 4, 4, 2, 9
H = W = 448
HK = WK = 28
FEAT_C = 384


def _reference_attention(q, k, v, kernel, scale):
    """Cross-scale NA computed tap-by-tap in numpy (bounded memory).

    q: (H, W, n, d); k, v: (hk, wk, n, d/dv). Returns (H, W, n*dv)."""
    hq, wq, n, d = q.shape
    hk, wk = k.shape[:2]
    r_h, r_w = hq // hk, wq // wk
    nh = kernel // 2
    cell_i = np.arange(hq) // r_h
    cell_j = np.arange(wq) // r_w
    ws_i = np.clip(cell_i - nh, 0, hk - kernel)
    ws_j = np.clip(cell_j - nh, 0, wk - kernel)
    taps = []
    qf = q.astype(np.float32) * np.float32(scale)
    for t in range(kernel):
        row = k[ws_i + t]  # (H, wk, n, d)
        for s in range(kernel):
            sel = row[:, ws_j + s]  # (H, W, n, d)
            taps.append(np.einsum("ijnd,ijnd->ijn", qf, sel, dtype=np.float32))
    logits = np.stack(taps, axis=-1)  # (H, W, n, k*k)
    logits -= logits.max(axis=-1, keepdims=True)
    p = np.exp(logits)
    p /= p.sum(axis=-1, keepdims=True)
    dv = v.shape[-1]
    out = np.zeros((hq, wq, n, dv), np.float32)
    t = 0
    for i in range(kernel):
        row = v[ws_i + i]
        for j in range(kernel):
            sel = row[:, ws_j + j]
            out += p[..., t : t + 1] * sel.astype(np.float32)
            t += 1
    return out.reshape(hq, wq, n * dv)


@pytest.mark.slow
def test_naf_api_golden_production_config():
    torch.manual_seed(10)
    ref_enc = _TorchImageEncoder(DIM, ROPE_HEADS, 100.0, LAYERS)
    ref_enc.eval()
    rng = np.random.RandomState(11)
    img = rng.randn(1, 3, H, W).astype(np.float32)
    feats = (rng.randn(1, FEAT_C, HK, WK) * 0.5).astype(np.float32)

    import torch.nn.functional as F

    with torch.no_grad():
        x = ref_enc(torch.from_numpy(img), (H, W))
        q = x.numpy()[0]  # (C, H, W)
        k = F.adaptive_avg_pool2d(x, (HK, WK)).numpy()[0]

    def heads_last(a, n):
        c = a.shape[0]
        return a.reshape(n, c // n, a.shape[1], a.shape[2]).transpose(2, 3, 0, 1)

    scale = (DIM // HEADS) ** -0.5
    want = _reference_attention(
        heads_last(q, HEADS),
        heads_last(k, HEADS),
        heads_last(feats[0], HEADS),
        KERNEL,
        scale,
    )  # (H, W, C_feat)

    model, _ = load_naf_params()  # reference defaults: dim 256, k 9
    params = naf_params_from_torch(
        _torch_state_with_prefix(ref_enc, "image_encoder"), img_layers=LAYERS
    )
    params = jax.tree.map(jnp.asarray, params)
    got = naf(model, params, img, feats, (H, W))  # NCHW in/out
    got = np.asarray(got)[0].transpose(1, 2, 0)  # -> (H, W, C)

    cos = float(
        np.sum(got * want)
        / (np.linalg.norm(got) * np.linalg.norm(want) + 1e-12)
    )
    assert cos > 0.999, cos
    np.testing.assert_allclose(got, want, atol=5e-3)

    # bf16 path within a looser bound (production inference dtype)
    got16 = naf(
        model,
        jax.tree.map(lambda a: a.astype(jnp.bfloat16), params),
        jnp.asarray(img, jnp.bfloat16),
        jnp.asarray(feats, jnp.bfloat16),
        (H, W),
    )
    got16 = np.asarray(got16, np.float32)[0].transpose(1, 2, 0)
    cos16 = float(
        np.sum(got16 * want)
        / (np.linalg.norm(got16) * np.linalg.norm(want) + 1e-12)
    )
    assert cos16 > 0.99, cos16
