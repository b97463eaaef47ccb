"""Layer- and model-level numerical parity vs the torch reference (CPU).

Covers: RoPE, conv encoder (with weight conversion), the full image-encoder
pipeline (dual conv stacks + adaptive pool + RoPE), and end-to-end NAF where
the attention is checked against the brute-force oracle from test_na2d.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from naf_tpu.convert import naf_params_from_torch
from naf_tpu.models import NAF
from naf_tpu.nn import Encoder, RoPE

from tests.reference_modules import ref_conv, ref_rope


def _nchw(x_nhwc):
    return np.asarray(x_nhwc).transpose(0, 3, 1, 2)


def _nhwc(x_nchw):
    return np.ascontiguousarray(np.asarray(x_nchw).transpose(0, 2, 3, 1))


@pytest.mark.parametrize("embed_dim,heads,base,hw", [
    (32, 2, 100.0, (14, 14)),
    (64, 4, 100.0, (9, 13)),
    (32, 1, 50.0, (28, 28)),
])
def test_rope_matches_reference(embed_dim, heads, base, hw):
    h, w = hw
    x = np.random.RandomState(0).randn(2, embed_dim, h, w).astype(np.float32)

    ref = ref_rope.RoPE(embed_dim, num_heads=heads, base=base)
    ref.eval()
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    mod = RoPE(embed_dim=embed_dim, num_heads=heads, base=base)
    got = mod.apply({}, jnp.asarray(_nhwc(x)))
    np.testing.assert_allclose(_nchw(got), want, atol=1e-5)


@pytest.mark.parametrize("ks,ks_res,layers", [(1, 1, 2), (3, 3, 2), (3, 3, 1)])
def test_encoder_matches_reference_with_converted_weights(ks, ks_res, layers):
    in_dim, hidden = 3, 16
    torch.manual_seed(0)
    ref = ref_conv.encoder(in_dim, hidden, kernel_size=ks, ks_res=ks_res, num_layers=layers)
    ref.eval()
    x = np.random.RandomState(1).randn(2, in_dim, 17, 23).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    from naf_tpu.convert import convert_encoder

    params = convert_encoder(dict(ref.state_dict()), prefix="", num_layers=layers)

    mod = Encoder(hidden_dim=hidden, kernel_size=ks, ks_res=ks_res, num_layers=layers)
    got = mod.apply({"params": params}, jnp.asarray(_nhwc(x)))
    np.testing.assert_allclose(_nchw(got), want, atol=1e-4)


class _TorchImageEncoder(torch.nn.Module):
    """Reference ImageEncoder rebuilt from natten-free parts (naf.py:11-52)."""

    def __init__(self, out_channels, heads_rope, rope_base, img_layers):
        super().__init__()
        self.encoder = ref_conv.encoder(3, out_channels // 2, kernel_size=1, ks_res=1,
                                        num_layers=img_layers)
        self.sem_encoder = ref_conv.encoder(3, out_channels // 2, kernel_size=3, ks_res=3,
                                            num_layers=img_layers)
        self.rope = ref_rope.RoPE(out_channels, num_heads=heads_rope, base=rope_base)

    def forward(self, x, output_size):
        import torch.nn.functional as F

        oh, ow = output_size
        h, w = x.shape[-2:]
        if h > 4 * oh or w > 4 * ow:
            x = F.interpolate(x, size=(min(h, 4 * oh, 4 * ow), min(w, 4 * ow, 4 * oh)),
                              mode="bilinear", align_corners=False)
        x = torch.cat([self.encoder(x), self.sem_encoder(x)], dim=1)
        x = F.adaptive_avg_pool2d(x, output_size=output_size)
        return self.rope(x)


def _torch_state_with_prefix(mod, prefix):
    return {f"{prefix}.{k}": v for k, v in mod.state_dict().items()}


def test_image_encoder_pipeline_matches_reference():
    dim, heads_rope, layers = 32, 2, 2
    torch.manual_seed(2)
    ref = _TorchImageEncoder(dim, heads_rope, 100.0, layers)
    ref.eval()
    x = np.random.RandomState(3).randn(1, 3, 48, 48).astype(np.float32)
    out_size = (24, 24)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), out_size).numpy()

    from naf_tpu.models.naf import ImageEncoder

    params = naf_params_from_torch(_torch_state_with_prefix(ref, "image_encoder"),
                                   img_layers=layers)
    mod = ImageEncoder(out_channels=dim, heads_rope=heads_rope, rope_base=100.0,
                       rope_rescale=2.0, img_layers=layers)
    got = mod.apply({"params": params["image_encoder"]}, jnp.asarray(_nhwc(x)), out_size)
    np.testing.assert_allclose(_nchw(got), want, atol=1e-4)


def test_naf_end_to_end_matches_torch_plus_bruteforce_na():
    """Full NAF forward vs reference pipeline with brute-force NA attention."""
    dim, heads_attn, heads_rope, layers, kernel = 32, 2, 2, 2, 5
    hk = wk = 8
    out_size = (24, 24)  # ratio 3
    feat_c = 12  # VFM channels, divisible by heads

    torch.manual_seed(4)
    ref_enc = _TorchImageEncoder(dim, heads_rope, 100.0, layers)
    ref_enc.eval()
    img = np.random.RandomState(5).randn(1, 3, 48, 48).astype(np.float32)
    feats = np.random.RandomState(6).randn(1, feat_c, hk, wk).astype(np.float32)

    # torch side: encoder -> q/k -> nearest-exact upsample handled by oracle
    import torch.nn.functional as F

    with torch.no_grad():
        x = ref_enc(torch.from_numpy(img), out_size)
        q = x.numpy()
        k = F.adaptive_avg_pool2d(x, (hk, wk)).numpy()

    def heads_last(a, n):
        b, c, h, w = a.shape
        return a.reshape(b, n, c // n, h, w).transpose(0, 3, 4, 1, 2)

    scale = (dim // heads_attn) ** -0.5
    # brute force on LR grid == reference upsample+dilated path (test_na2d)
    from naf_tpu.ops import cross_scale_na2d

    want = cross_scale_na2d(
        jnp.asarray(heads_last(q, heads_attn)),
        jnp.asarray(heads_last(k, heads_attn)),
        jnp.asarray(heads_last(feats, heads_attn)),
        kernel,
        scale=scale,
    )
    want = np.asarray(want).reshape(1, *out_size, feat_c)

    model = NAF(dim=dim, heads_attn=heads_attn, heads_rope=heads_rope,
                kernel_size=kernel, img_layers=layers, na_impl="xla")
    params = naf_params_from_torch(
        _torch_state_with_prefix(ref_enc, "image_encoder"), img_layers=layers
    )
    got = model.apply({"params": params}, jnp.asarray(_nhwc(img)),
                      jnp.asarray(_nhwc(feats)), out_size)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_rope_train_augmentations_change_output_deterministically():
    dim, heads = 32, 2
    x = jnp.asarray(np.random.RandomState(7).randn(1, 8, 8, dim).astype(np.float32))
    mod = RoPE(embed_dim=dim, num_heads=heads, base=100.0, rescale_coords=2.0)
    eval_out = mod.apply({}, x)
    rng = jax.random.PRNGKey(0)
    train_out = mod.apply({}, x, train=True, rng=rng)
    train_out2 = mod.apply({}, x, train=True, rng=rng)
    assert not np.allclose(np.asarray(eval_out), np.asarray(train_out))
    np.testing.assert_array_equal(np.asarray(train_out), np.asarray(train_out2))


@pytest.mark.parametrize("hi,up,down", [
    (14, 64, 8),    # integer up ratio, divisible down
    (14, 60, 6),    # non-integer up ratio (60/14)
    (16, 16, 4),    # identity up (full-res regime)
])
def test_rope_pooled_keys_matches_modular(hi, up, down):
    """RoPE.pooled (separable keys collapse) must match
    pool(rope(pool_up(x))) — the modular KeyEncoder path."""
    from naf_tpu.ops.pool import adaptive_avg_pool2d

    rope = RoPE(embed_dim=32, num_heads=2)
    x = jnp.asarray(
        np.random.RandomState(1).randn(2, hi, hi, 32).astype(np.float32)
    )
    params = rope.init(jax.random.PRNGKey(0), x)

    def modular(x):
        xu = adaptive_avg_pool2d(x, (up, up))
        r = rope.apply(params, xu)
        return adaptive_avg_pool2d(r, (down, down))

    def separable(x):
        return rope.apply(
            params, x, up_hw=(up, up), down_hw=(down, down), method=rope.pooled
        )

    want = np.asarray(modular(x))
    got = np.asarray(separable(x))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)
