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


@pytest.mark.parametrize("shape", [
    # (hq, wq, hk, wk, kk, n, d, dv) — scaled analogues of configs the old
    # forward-model proxy budget rejected, silently routing training to the
    # slow XLA-oracle VJP: embed_dim>=768 (dv-heavy) and ratio 32
    (48, 48, 12, 12, 5, 4, 64, 192),   # dv = 3x d (embed_dim 768 analogue)
    (192, 192, 6, 6, 5, 4, 64, 32),    # ratio 32 (f32-sized; bf16 fits dv 96)
])
def test_bwd_kernel_unlocked_shapes(shape):
    """The dedicated backward picker (pick_cell_blocks_bwd) must tile these
    and the Pallas recompute-P backward must match the oracle VJP."""
    from naf_tpu.kernels.na2d_fused import pick_cell_blocks_bwd

    hq, wq, hk, wk, kk, n, d, dv = shape
    assert pick_cell_blocks_bwd(
        hq // hk, wq // wk, hk, wk, kk, n, d, dv, 4
    ) is not None
    q, k, v = _qkv(hq, wq, hk, wk, n=n, d=d, dv=dv)

    def loss_fused(q, k, v):
        return jnp.sum(cross_scale_na2d_fused(q, k, v, kk, interpret=True) ** 2)

    def loss_oracle(q, k, v):
        return jnp.sum(cross_scale_na2d(q, k, v, kk) ** 2)

    ga = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gb = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_bwd_picker_covers_production_configs():
    """The exact (bf16) training configs that regressed to the oracle in the
    round-2 sweeps must tile under the backward picker."""
    from naf_tpu.kernels.na2d_fused import pick_cell_blocks_bwd

    for r, dv in [(16, 192), (16, 256), (32, 96), (16, 96), (8, 96)]:
        assert pick_cell_blocks_bwd(r, r, 28, 28, 9, 4, 64, dv, 2) is not None, \
            f"ratio {r}, dv {dv}"


def test_fwd_subcell_chunks_match_oracle(monkeypatch):
    """Pass-2 picker coverage (f32 ratio-32): chunk_rows below r_h must be
    exact — the kernel derives the cell row from the global query row."""
    import naf_tpu.kernels.na2d_fused as M

    hq = wq = 48
    hk = wk = 6
    kk = 5
    q, k, v = _qkv(hq, wq, hk, wk, n=4, d=64, dv=32)
    # force a sub-cell chunk (r_h = 8, chunk 2) through the real dispatch
    monkeypatch.setattr(M, "_pick_fwd", lambda *a, **kw: (1, 2, 2))
    got = M.cross_scale_na2d_fused(q, k, v, kk, interpret=True)
    want = cross_scale_na2d(q, k, v, kk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fwd_picker_f32_r32_covered():
    """The f32 ratio-32 configs the legacy model rejected now tile (pass 2)."""
    from naf_tpu.kernels.na2d_fused import _pick_fwd, fused_applicable

    for (kk, n, d, dv) in [(9, 4, 64, 96), (7, 8, 32, 48)]:
        got = _pick_fwd(32, 32, 28, 28, kk, n, d, dv, 4)
        assert got is not None and got[2] < 32, got  # sub-cell chunk
        assert fused_applicable(896, 896, 28, 28, kk, n=n, d=d, dv=dv,
                                itemsize=4)
