"""Fully-fused upsampling attention (pool-up + RoPE + NA in one kernel) vs
the modular composition, interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from naf_tpu.kernels.na2d_fused_q import (
    fused_q_applicable,
    naf_upsample_attention,
    pick_geometry,
)
from naf_tpu.nn.rope import RoPE
from naf_tpu.ops import cross_scale_na2d
from naf_tpu.ops.pool import adaptive_avg_pool2d


def _modular(enc, values, rope, params, out_hw, kk, n):
    """poolup -> rope -> keys pool -> oracle NA (the NAF inference path)."""
    b, _, _, c = enc.shape
    hk, wk = values.shape[1:3]
    d = c // n
    dv = values.shape[-1] // n
    xu = adaptive_avg_pool2d(enc, out_hw)
    x = rope.apply(params, xu)
    keys = adaptive_avg_pool2d(x, (hk, wk))
    q = x.reshape(b, *out_hw, n, d)
    k = keys.reshape(b, hk, wk, n, d)
    v = values.reshape(b, hk, wk, n, dv)
    out = cross_scale_na2d(q, k, v, kk, scale=d ** -0.5)
    return out.reshape(b, *out_hw, n * dv)


def _fused(enc, values, rope, params, out_hw, kk, n):
    b, _, _, c = enc.shape
    hk, wk = values.shape[1:3]
    keys = rope.apply(
        params, enc, up_hw=out_hw, down_hw=(hk, wk), method=rope.pooled
    )
    sin_r, cos_r, sin_c, cos_c = rope.apply(
        params, out_hw[0], out_hw[1], method=rope.tables
    )
    rows_tab = jnp.concatenate([cos_r, sin_r], axis=-1)
    cols_tab = jnp.concatenate([cos_c, sin_c], axis=-1)
    return naf_upsample_attention(
        enc, keys, values, rows_tab, cols_tab, c // n,
        num_heads=n, kernel_size=kk, interpret=True,
    )


@pytest.mark.parametrize("hi,wi,out,hk,wk,kk", [
    (32, 32, (64, 64), 16, 16, 9),     # 2x pool-up, r=4
    (64, 64, (64, 64), 16, 16, 9),     # identity pool (full-res regime)
    (24, 24, (64, 64), 16, 16, 9),     # non-integer pool-up ratio (8/3)
    (24, 16, (64, 32), 16, 8, 5),      # rect grids, k=5
])
def test_fused_q_matches_modular(hi, wi, out, hk, wk, kk):
    n, c, cv = 2, 128, 96
    assert fused_q_applicable(
        out[0], out[1], hi, wi, hk, wk, kk, n=n, d=c // n, dv=cv // n
    ), pick_geometry(out[0], out[1], hi, wi, hk, wk, kk, n, c // n, cv // n)
    rng = np.random.RandomState(0)
    enc = jnp.asarray(rng.randn(1, hi, wi, c).astype(np.float32))
    values = jnp.asarray(rng.randn(1, hk, wk, cv).astype(np.float32))
    rope = RoPE(embed_dim=c, num_heads=n)
    params = rope.init(jax.random.PRNGKey(0), enc)

    want = np.asarray(_modular(enc, values, rope, params, out, kk, n))
    got = np.asarray(_fused(enc, values, rope, params, out, kk, n))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_fused_q_padded_heads_matches_modular():
    """d % 128 != 0 with ceil128(d) < lcm(d, 128) takes the padded-per-head
    QK layout (g = 1, zero-padded lanes) instead of the block-diag
    expansion — numerics must be exactly the modular composition's
    (padded k lanes are zero, padded q lanes multiply them)."""
    from naf_tpu.kernels.na2d_fused_q import _head_pad

    n, c, cv = 2, 192, 96  # d = 96 -> dp = 128 < lcm(96, 128) = 384
    assert _head_pad(c // n, False) == 128
    hi = wi = 32
    out = (64, 64)
    hk = wk = 16
    rng = np.random.RandomState(5)
    enc = jnp.asarray(rng.randn(1, hi, wi, c).astype(np.float32))
    values = jnp.asarray(rng.randn(1, hk, wk, cv).astype(np.float32))
    rope = RoPE(embed_dim=c, num_heads=n)
    params = rope.init(jax.random.PRNGKey(0), enc)

    want = np.asarray(_modular(enc, values, rope, params, out, 9, n))
    got = np.asarray(_fused(enc, values, rope, params, out, 9, n))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_fused_q_banded_matches_full():
    """Banded fused-q execution (cell-row ranges) must be bit-identical to
    the full-grid kernel (global window rule)."""
    hi = wi = 32
    out = (64, 64)
    hk = wk = 16
    n, c, cv = 2, 128, 96
    rng = np.random.RandomState(2)
    enc = jnp.asarray(rng.randn(1, hi, wi, c).astype(np.float32))
    values = jnp.asarray(rng.randn(1, hk, wk, cv).astype(np.float32))
    rope = RoPE(embed_dim=c, num_heads=n)
    params = rope.init(jax.random.PRNGKey(0), enc)

    full = np.asarray(_fused(enc, values, rope, params, out, 9, n))

    keys = rope.apply(
        params, enc, up_hw=out, down_hw=(hk, wk), method=rope.pooled
    )
    sin_r, cos_r, sin_c, cos_c = rope.apply(
        params, out[0], out[1], method=rope.tables
    )
    rows_tab = jnp.concatenate([cos_r, sin_r], axis=-1)
    cols_tab = jnp.concatenate([cos_c, sin_c], axis=-1)
    geom = pick_geometry(out[0], out[1], hi, wi, hk, wk, 9, n, c // n,
                         (cv // n))
    band = geom[0] * 2  # two cell blocks per band
    bands = [
        naf_upsample_attention(
            enc, keys, values, rows_tab, cols_tab, c // n,
            num_heads=n, kernel_size=9, interpret=True,
            row_cell0=c0, band_cells=band,
        )
        for c0 in range(0, hk, band)
    ]
    got = np.asarray(jnp.concatenate(bands, axis=1))
    np.testing.assert_array_equal(got, full)


def test_naf_fused_q_banded_model_matches_unbanded():
    """NAF band_rows routed through the banded fused-q path (DUS assembly)
    must equal the unbanded fused-q forward exactly."""
    from naf_tpu.models.naf import NAF

    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(1, 16, 16, 64).astype(np.float32))
    m = NAF(na_impl="fused_q", dim=128, heads_attn=2, heads_rope=2,
            kernel_size=9, img_layers=1)
    params = m.init(jax.random.PRNGKey(0), img, feats, (64, 64))
    full = np.asarray(m.apply(params, img, feats, (64, 64)))
    banded = np.asarray(m.apply(params, img, feats, (64, 64), band_rows=16))
    np.testing.assert_array_equal(banded, full)


def test_naf_streamed_matches_model():
    """naf_streamed (per-band donated jits, aliased output buffer) must
    match the in-model fused-q forward. Not bit-exact: prep is a separate
    jit from the model's single program, so XLA fuses the encoder/keys
    differently (f32 rounding only)."""
    from naf_tpu.api import naf_streamed
    from naf_tpu.models.naf import NAF

    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(1, 16, 16, 64).astype(np.float32))
    m = NAF(na_impl="fused_q", dim=128, heads_attn=2, heads_rope=2,
            kernel_size=9, img_layers=1)
    params = m.init(jax.random.PRNGKey(0), img, feats, (64, 64))["params"]
    full = np.asarray(m.apply({"params": params}, img, feats, (64, 64)))
    got = np.asarray(
        naf_streamed(m, params, img, feats, (64, 64), band_rows=16,
                     interpret=True)
    )
    np.testing.assert_allclose(got, full, atol=1e-5, rtol=1e-4)


def test_naf_fused_q_path_matches_modular():
    """End-to-end NAF: na_impl='fused_q' (fully-fused inference path,
    interpret mode) must match na_impl='xla' (modular oracle path)."""
    from naf_tpu.models.naf import NAF

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(1, 16, 16, 64).astype(np.float32))
    kw = dict(dim=128, heads_attn=2, heads_rope=2, kernel_size=9,
              img_layers=1)
    m_fused = NAF(na_impl="fused_q", **kw)
    m_xla = NAF(na_impl="xla", **kw)
    params = m_xla.init(jax.random.PRNGKey(0), img, feats, (64, 64))
    assert m_fused.bind(params)._fused_q_ok(img, feats, (64, 64))
    want = np.asarray(m_xla.apply(params, img, feats, (64, 64)))
    got = np.asarray(m_fused.apply(params, img, feats, (64, 64)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_fused_q_gradients_match_modular():
    """The custom VJP (pure-XLA twin backward) must match jax.grad of the
    independent modular composition — training (and the harness's backward
    benchmark) differentiates through the inference attention entry."""
    hi = wi = 32
    out = (64, 64)
    hk = wk = 16
    n, c, cv = 2, 128, 96
    kk = 9
    rng = np.random.RandomState(3)
    enc = jnp.asarray(rng.randn(1, hi, wi, c).astype(np.float32))
    values = jnp.asarray(rng.randn(1, hk, wk, cv).astype(np.float32))
    rope = RoPE(embed_dim=c, num_heads=n)
    params = rope.init(jax.random.PRNGKey(0), enc)
    cot = jnp.asarray(rng.randn(1, *out, cv).astype(np.float32))

    def loss_fused(e, v):
        return jnp.sum(_fused(e, v, rope, params, out, kk, n) * cot)

    def loss_mod(e, v):
        return jnp.sum(_modular(e, v, rope, params, out, kk, n) * cot)

    ga = jax.grad(loss_fused, argnums=(0, 1))(enc, values)
    gb = jax.grad(loss_mod, argnums=(0, 1))(enc, values)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3
        )


def test_fused_q_bf16_matches_f32_oracle():
    """The bf16 fast path (deferred-normalize softmax, log2e folded into the
    K scale + in-kernel exp2) must stay within bf16-grade error of the f32
    modular oracle, in both the pool-up and identity-pool regimes."""
    n, c, cv = 2, 128, 96
    rng = np.random.RandomState(1)
    for hi, wi, out in [(32, 32, (64, 64)), (64, 64, (64, 64))]:
        enc32 = jnp.asarray(rng.randn(1, hi, wi, c).astype(np.float32))
        values32 = jnp.asarray(rng.randn(1, 16, 16, cv).astype(np.float32))
        rope = RoPE(embed_dim=c, num_heads=n)
        params = rope.init(jax.random.PRNGKey(0), enc32)

        want = np.asarray(_modular(enc32, values32, rope, params, out, 9, n))
        got = np.asarray(
            _fused(
                enc32.astype(jnp.bfloat16), values32.astype(jnp.bfloat16),
                rope, params, out, 9, n,
            )
        ).astype(np.float32)
        # bf16 has ~2-3 significant decimal digits; outputs are O(1)
        err = np.abs(got - want)
        assert err.max() < 0.15, err.max()
        cos = np.vdot(got, want) / (
            np.linalg.norm(got) * np.linalg.norm(want)
        )
        assert cos > 0.9995, cos


def test_pick_w_tiles_skips_merge_for_dma_sized_tiles():
    """Column-tile merging is only worth its VMEM cost when wt=1 output
    tiles are small: at the north-star geometry (bh 32 x bw 64 x 384ch
    bf16 = 1.5 MB) the sweep measured wt=1 fastest (10.56 vs 10.67 ms) and
    wt=4 failing to compile, so the picker must return 1 there while still
    merging genuinely tiny-tile configs."""
    from naf_tpu.kernels.na2d_fused_q import _pick_w_tiles

    # north-star config: 448^2 -> 2048^2 r16 bf16, geom (2, 4)
    wt = _pick_w_tiles(n_cw=32, bh=32, bw=64, c=256, dv=96, n=4, gd=64,
                       ih=7, iwe=14, pool_identity=False, itemsize=2,
                       rot_in_kernel=True)
    assert wt == 1

    # small-tile config (56x8x4x8x2 = 28 KB output tile): merging allowed
    wt_small = _pick_w_tiles(n_cw=4, bh=56, bw=8, c=128, dv=8, n=4, gd=32,
                             ih=7, iwe=8, pool_identity=True, itemsize=2,
                             rot_in_kernel=False)
    assert wt_small >= 2
