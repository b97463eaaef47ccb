"""Parity tests: resize / adaptive pool vs torch CPU reference semantics."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from naf_tpu.ops import adaptive_avg_pool2d, resize_bilinear, resize_nearest_exact

SIZES = [
    ((7, 7), (28, 28)),
    ((28, 28), (448, 448)),
    ((13, 17), (97, 51)),  # ragged up
    ((64, 64), (32, 32)),  # exact down
    ((50, 40), (17, 23)),  # ragged down
    ((10, 10), (10, 10)),  # identity
]


def _rand(b, c, h, w, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(b, c, h, w).astype(np.float32)


@pytest.mark.parametrize("in_hw,out_hw", SIZES)
def test_nearest_exact_matches_torch(in_hw, out_hw):
    x = _rand(2, 3, *in_hw)
    ref = F.interpolate(torch.from_numpy(x), size=out_hw, mode="nearest-exact").numpy()
    got = resize_nearest_exact(jnp.asarray(x.transpose(0, 2, 3, 1)), out_hw)
    np.testing.assert_array_equal(np.asarray(got).transpose(0, 3, 1, 2), ref)


@pytest.mark.parametrize("in_hw,out_hw", SIZES)
def test_bilinear_matches_torch(in_hw, out_hw):
    x = _rand(2, 3, *in_hw, seed=1)
    ref = F.interpolate(
        torch.from_numpy(x), size=out_hw, mode="bilinear", align_corners=False
    ).numpy()
    got = resize_bilinear(jnp.asarray(x.transpose(0, 2, 3, 1)), out_hw)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref, atol=5e-5)


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((448, 448), (28, 28)),  # divisible (fast path)
        ((449, 451), (28, 28)),  # ragged
        ((37, 53), (16, 24)),
        ((16, 16), (16, 16)),
        ((14, 14), (9, 9)),
        ((100, 100), (7, 13)),
    ],
)
def test_adaptive_avg_pool_matches_torch(in_hw, out_hw):
    x = _rand(2, 5, *in_hw, seed=2)
    ref = F.adaptive_avg_pool2d(torch.from_numpy(x), out_hw).numpy()
    got = adaptive_avg_pool2d(jnp.asarray(x.transpose(0, 2, 3, 1)), out_hw)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref, atol=1e-5)
