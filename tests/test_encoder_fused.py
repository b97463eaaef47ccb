"""Fused Pallas encoder vs the flax Encoder stack (interpret mode).

The fused path (naf_tpu/kernels/encoder_fused.py) must reproduce
Encoder = stem + [GN -> SiLU -> reflect-conv]*2N exactly from the SAME
parameter tree (reference semantics: src/layers/convolutions.py:6-92).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from naf_tpu.kernels.encoder_fused import (
    encoder_stack_fused,
    fused_encoder_applicable,
    gn_silu_conv_fused,
)
from naf_tpu.nn import Encoder


@pytest.mark.parametrize("ks", [1, 3])
def test_fused_stack_matches_flax(ks):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 24, 3), jnp.float32)
    enc = Encoder(128, kernel_size=ks, ks_res=ks, num_layers=2)
    params = enc.init(jax.random.PRNGKey(0), x)["params"]
    want = enc.apply({"params": params}, x)
    got = encoder_stack_fused(params, x, 128, ks, ks, 2, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_fused_layer_groupnorm_stats_roundtrip():
    """psums -> next layer's GN affine reproduces flax GroupNorm exactly."""
    from flax import linen as nn

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 16, 16, 128), jnp.float32)
    scale = jnp.ones((128,), jnp.float32)
    shift = jnp.zeros((128,), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 128, 128) * 0.05, jnp.float32)
    b = jnp.asarray(rng.randn(128) * 0.1, jnp.float32)
    y, ps = gn_silu_conv_fused(x, scale, shift, w, b, kernel_size=3,
                               interpret=True)
    # psums must equal direct sums of y
    np.testing.assert_allclose(
        np.asarray(ps[:, 0]), np.asarray(jnp.sum(y, axis=(1, 2))), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ps[:, 1]), np.asarray(jnp.sum(y * y, axis=(1, 2))), rtol=1e-5
    )
    # and the folded GN affine from psums must match flax GroupNorm on y
    from naf_tpu.kernels.encoder_fused import _gn_affine

    gamma = jnp.asarray(rng.rand(128) + 0.5, jnp.float32)
    beta = jnp.asarray(rng.randn(128) * 0.2, jnp.float32)
    sc, sh = _gn_affine(ps, gamma, beta, 16 * 16, 8, 1e-5)
    got = y * sc[:, None, None, :] + sh[:, None, None, :]
    gn = nn.GroupNorm(num_groups=8, epsilon=1e-5)
    want = gn.apply({"params": {"scale": gamma, "bias": beta}}, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_applicability_gate():
    assert fused_encoder_applicable((1, 448, 448, 3), 3, 128)
    assert fused_encoder_applicable((1, 2048, 2048, 3), 3, 128)
    assert not fused_encoder_applicable((1, 448, 448, 3), 5, 128)  # kernel
    assert not fused_encoder_applicable((1, 448, 448, 3), 3, 96)  # lanes


def test_adaptive_conv_fused_matches_xla():
    """Pallas spatially-varying conv vs the XLA fallback (FeatUp
    AdaptiveConv semantics, reference src/model/featup.py:126)."""
    from naf_tpu.kernels.adaptive_conv_fused import adaptive_conv_fused
    from naf_tpu.ops.adaptive_conv import adaptive_conv

    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(2, 22, 38, 128), jnp.float32)
    ker = jnp.asarray(rng.rand(2, 16, 32, 7, 7), jnp.float32)
    got = adaptive_conv_fused(src, ker, interpret=True)
    want = adaptive_conv(src, ker)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_stack_gradients_match_flax():
    """The fused stack's custom VJP (XLA-twin backward) must match
    jax.grad of the flax Encoder."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 16, 16, 3), jnp.float32)
    enc = Encoder(128, kernel_size=3, ks_res=3, num_layers=2)
    params = enc.init(jax.random.PRNGKey(0), x)["params"]

    def loss_fused(p, v):
        return jnp.sum(
            encoder_stack_fused(p, v, 128, 3, 3, 2, interpret=True) ** 2
        )

    def loss_flax(p, v):
        return jnp.sum(enc.apply({"params": p}, v) ** 2)

    ga = jax.grad(loss_fused, argnums=(0, 1))(params, x)
    gb = jax.grad(loss_flax, argnums=(0, 1))(params, x)
    la = {str(k): v for k, v in jax.tree_util.tree_leaves_with_path(ga)}
    lb = {str(k): v for k, v in jax.tree_util.tree_leaves_with_path(gb)}
    assert la.keys() == lb.keys()
    for k in la:
        np.testing.assert_allclose(np.asarray(la[k]), np.asarray(lb[k]),
                                   rtol=5e-3, atol=5e-3)


def test_packed_dual_stack_matches_concat():
    """encoder_stack_fused_packed (both stacks' final layers aliasing one
    buffer) must equal concat(pix_stack, sem_stack) exactly — it replaces
    ImageEncoder.encode's torch.cat analogue (reference src/model/naf.py:34)
    on the inference path."""
    from naf_tpu.kernels.encoder_fused import encoder_stack_fused_packed

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.float32)
    pix = Encoder(128, kernel_size=1, ks_res=1, num_layers=2)
    sem = Encoder(128, kernel_size=3, ks_res=3, num_layers=2)
    p_pix = pix.init(jax.random.PRNGKey(0), x)["params"]
    p_sem = sem.init(jax.random.PRNGKey(1), x)["params"]
    want = jnp.concatenate(
        [
            encoder_stack_fused(p_pix, x, 128, 1, 1, 2, interpret=True),
            encoder_stack_fused(p_sem, x, 128, 3, 3, 2, interpret=True),
        ],
        axis=-1,
    )
    got = encoder_stack_fused_packed(p_pix, p_sem, x, 128, 2, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_dual_route_matches_concat():
    """The opt-in dual-pass route (one kernel computing both stacks per
    layer, merged im2col stem — kept as an ablation; measured slower e2e
    than per-stack fused layers, see encoder_fused.DUAL_ROUTE) must match
    concat(pix_stack, sem_stack). Tolerance is ulp-level, not exact: the
    merged stem embeds the pixel 1x1 weights at the 3x3 grid's center tap,
    and XLA's f32 reduction tree over the 27-lane contraction orders the
    same addends differently than the separate 3-lane stem."""
    from naf_tpu.kernels.encoder_fused import _dual_fwd_impl

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.float32)
    pix = Encoder(128, kernel_size=1, ks_res=1, num_layers=2)
    sem = Encoder(128, kernel_size=3, ks_res=3, num_layers=2)
    p_pix = pix.init(jax.random.PRNGKey(0), x)["params"]
    p_sem = sem.init(jax.random.PRNGKey(1), x)["params"]
    want = jnp.concatenate(
        [
            encoder_stack_fused(p_pix, x, 128, 1, 1, 2, interpret=True),
            encoder_stack_fused(p_sem, x, 128, 3, 3, 2, interpret=True),
        ],
        axis=-1,
    )
    got = _dual_fwd_impl(p_pix, p_sem, x, 128, 2, 8, 1e-5, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-4
    )


def test_packed_dual_stack_gradients():
    """jax.grad through the packed dual stack (the 448^2+ TPU inference
    route, which the bench harness's backward pass also hits) must match
    grads of the plain concat composition — regression for the bare
    AssertionError the r16/448^2 sweep rows recorded when the packed path
    had no VJP."""
    from naf_tpu.kernels.encoder_fused import encoder_stack_fused_packed

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(1, 16, 16, 3), jnp.float32)
    pix = Encoder(128, kernel_size=1, ks_res=1, num_layers=2)
    sem = Encoder(128, kernel_size=3, ks_res=3, num_layers=2)
    p_pix = pix.init(jax.random.PRNGKey(0), x)["params"]
    p_sem = sem.init(jax.random.PRNGKey(1), x)["params"]
    cot = jnp.asarray(rng.randn(1, 16, 16, 256).astype(np.float32))

    def loss_packed(pp, ps, v):
        return jnp.sum(
            encoder_stack_fused_packed(pp, ps, v, 128, 2, interpret=True)
            * cot
        )

    def loss_concat(pp, ps, v):
        return jnp.sum(
            jnp.concatenate(
                [
                    encoder_stack_fused(pp, v, 128, 1, 1, 2, interpret=True),
                    encoder_stack_fused(ps, v, 128, 3, 3, 2, interpret=True),
                ],
                axis=-1,
            )
            * cot
        )

    ga = jax.grad(loss_packed, argnums=(0, 1, 2))(p_pix, p_sem, x)
    gb = jax.grad(loss_concat, argnums=(0, 1, 2))(p_pix, p_sem, x)
    la, lb = jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def test_fused_stack_batch8_matches_flax():
    """Regression: per-batch GN scale/shift blocks were (1, C) over (B, C),
    which Mosaic rejects for B > 1 (hit by the denoising trainer at bs 8);
    they now ride a (B, 1, C) layout legal at any batch."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(8, 16, 24, 3), jnp.float32)
    enc = Encoder(128, kernel_size=3, ks_res=3, num_layers=1)
    params = enc.init(jax.random.PRNGKey(0), x)["params"]
    want = enc.apply({"params": params}, x)
    got = encoder_stack_fused(params, x, 128, 3, 3, 1, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )
