"""Unit tests for the fold-proof timing harness.

The harness must (a) leave values numerically identical (the additive
epsilon rounds to identity for normal floats), (b) chain iterations through
a full reduction so XLA cannot slice through the computation, and (c) stay
finite-safe when outputs overflow.
"""

import jax
import jax.numpy as jnp
import numpy as np

from naf_tpu.utils.benchmarking import _perturbed_args, device_time_ms


def test_perturbation_is_identity_for_normal_values():
    x = jnp.asarray(np.random.RandomState(0).randn(64, 64), jnp.float32)
    (xp,) = _perturbed_args((x,), jnp.float32(0.37), "all")
    np.testing.assert_array_equal(np.asarray(xp), np.asarray(x))
    xb = x.astype(jnp.bfloat16)
    (xbp,) = _perturbed_args((xb,), jnp.float32(-1234.5), "all")
    np.testing.assert_array_equal(np.asarray(xbp), np.asarray(xb))


def test_perturbation_clips_overflowing_chain():
    # a reduction that overflowed to inf must not visibly perturb inputs
    x = jnp.ones((8, 8), jnp.float32)
    (xp,) = _perturbed_args((x,), jnp.float32(np.inf), "all")
    np.testing.assert_array_equal(np.asarray(xp), np.asarray(x))


def test_smallest_mode_targets_smallest_float_leaf():
    big = jnp.zeros((32, 32), jnp.float32)
    small = jnp.zeros((4,), jnp.float32)
    ints = jnp.zeros((2,), jnp.int32)
    out = _perturbed_args((big, small, ints), jnp.float32(1.0), "smallest")
    # values unchanged either way; ints never touched
    assert out[2].dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(big))


def test_device_time_ms_runs_and_is_positive():
    a = jnp.asarray(np.random.RandomState(1).randn(256, 256), jnp.float32)
    ms = device_time_ms(lambda x: x @ x, a, iters=3, repeats=1)
    assert ms >= 0.0


def test_scalar_chain_runs_and_serializes_on_carry():
    # chain="scalar" must produce a finite per-call time and thread the
    # output element through the carry (serialization dependency exists).
    a = jnp.asarray(np.random.RandomState(2).randn(128, 128), jnp.float32)
    ms = device_time_ms(
        lambda x: x + 1.0, a, iters=3, repeats=1, chain="scalar"
    )
    assert ms >= 0.0
