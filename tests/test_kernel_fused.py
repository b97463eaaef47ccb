"""Fused Pallas cross-scale-NA kernel vs the XLA oracle (interpret mode on CPU;
the same comparisons run compiled on real TPU via scripts in tools/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from naf_tpu.kernels.na2d_fused import cross_scale_na2d_fused, fused_applicable
from naf_tpu.ops import cross_scale_na2d


def _qkv(hq, wq, hk, wk, n=2, d=16, dv=24, seed=0):
    rng = np.random.RandomState(seed)
    return (
        jnp.asarray(rng.randn(1, hq, wq, n, d).astype(np.float32)),
        jnp.asarray(rng.randn(1, hk, wk, n, d).astype(np.float32)),
        jnp.asarray(rng.randn(1, hk, wk, n, dv).astype(np.float32)),
    )


@pytest.mark.parametrize("hq,wq,hk,wk,kk", [
    (48, 48, 12, 12, 5),   # r=4
    (64, 48, 16, 12, 9),   # r=4, rect
    (26, 26, 13, 13, 9),   # r=2, ragged cell blocks
])
def test_fused_matches_oracle_interpret(hq, wq, hk, wk, kk):
    assert fused_applicable(hq, wq, hk, wk, kk, n=2, d=16, dv=24)
    q, k, v = _qkv(hq, wq, hk, wk)
    got = cross_scale_na2d_fused(q, k, v, kk, interpret=True)
    want = cross_scale_na2d(q, k, v, kk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_fused_gradients_match_oracle():
    q, k, v = _qkv(24, 24, 12, 12)

    def loss_fused(q, k, v):
        return jnp.sum(cross_scale_na2d_fused(q, k, v, 5, interpret=True) ** 2)

    def loss_oracle(q, k, v):
        return jnp.sum(cross_scale_na2d(q, k, v, 5) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_fused_applicability_gates():
    assert not fused_applicable(100, 100, 13, 13, 9)  # ragged ratio
    assert not fused_applicable(48, 48, 5, 5, 9)  # grid < kernel
    assert fused_applicable(448, 448, 28, 28, 9)
    assert fused_applicable(2048, 2048, 128, 128, 9)


def test_backward_oracle_fallback_many_heads():
    """Shapes whose Pallas backward doesn't tile under the bwd VMEM budget
    must fall back to the oracle VJP rather than erroring (AnyUp's 8-head
    d=32 config at training time)."""
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(1, 48, 48, 8, 16), jnp.float32)
    k = jnp.asarray(rng.randn(1, 12, 12, 8, 16), jnp.float32)
    v = jnp.asarray(rng.randn(1, 12, 12, 8, 24), jnp.float32)

    def loss_fused(q, k, v):
        return jnp.sum(cross_scale_na2d_fused(q, k, v, 5, interpret=True) ** 2)

    def loss_oracle(q, k, v):
        from naf_tpu.ops.na2d import cross_scale_na2d

        return jnp.sum(cross_scale_na2d(q, k, v, 5) ** 2)

    ga = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gb = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
