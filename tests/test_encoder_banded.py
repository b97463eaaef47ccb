"""Banded two-pass-GroupNorm encoder parity (kernels/encoder_banded.py).

The banded pipeline must reproduce the full-resolution stack bit-for-bit
(same stats, same reflect-pad convs) while touching only O(band_rows * W)
activations per step. Parity target: the pure-XLA stack twin
(kernels/encoder_fused._encoder_stack_xla), itself parity-tested against
naf_tpu.nn.Encoder. Reference behavior: src/model/naf.py:26-51 encoder at
guarded input resolution (which has no banded mode at all)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from naf_tpu.kernels.encoder_banded import (
    encoder_stack_banded,
    encoder_stack_banded_rows,
    encoder_stack_stats,
)
from naf_tpu.kernels.encoder_fused import _encoder_stack_xla
from naf_tpu.nn.conv import Encoder


def _init(kernel_size, ks_res, hidden=16, num_layers=2, seed=0):
    enc = Encoder(hidden, kernel_size=kernel_size, ks_res=ks_res,
                  num_layers=num_layers)
    x = jnp.asarray(
        np.random.RandomState(seed).randn(2, 32, 24, 3), jnp.float32
    )
    params = enc.init(jax.random.PRNGKey(seed), x)["params"]
    return enc, params, x


@pytest.mark.parametrize("kernel_size,ks_res", [(1, 1), (3, 3)])
@pytest.mark.parametrize("band_rows", [8, 12, 32])
def test_banded_matches_full(kernel_size, ks_res, band_rows):
    _, params, x = _init(kernel_size, ks_res)
    ref = _encoder_stack_xla(params, x, 16, kernel_size, ks_res, 2, 8, 1e-5)
    out = encoder_stack_banded(
        params, x, 16, kernel_size, ks_res, band_rows=band_rows
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_banded_rows_streams_any_range():
    _, params, x = _init(3, 3)
    ref = _encoder_stack_xla(params, x, 16, 3, 3, 2, 8, 1e-5)
    stats = encoder_stack_stats(params, x, 3, 3, band_rows=8)
    for r0, n in ((0, 8), (8, 16), (24, 8), (4, 12)):
        band = encoder_stack_banded_rows(params, x, r0, n, stats, 3, 3)
        np.testing.assert_allclose(
            np.asarray(band), np.asarray(ref[:, r0 : r0 + n]),
            rtol=2e-5, atol=2e-5,
        )


def test_stats_match_full_resolution():
    """Banded stats must equal the full-image GroupNorm fold exactly."""
    from naf_tpu.kernels.encoder_fused import (
        _channel_sums,
        _gn_affine,
        _stem_conv_matmul,
    )

    _, params, x = _init(3, 3)
    stats = encoder_stack_stats(params, x, 3, 3, band_rows=8)
    y0 = _stem_conv_matmul(
        x, params["stem"]["conv"]["kernel"], params["stem"]["conv"]["bias"], 3
    )
    blk = params["block0"]
    ref = _gn_affine(
        _channel_sums(y0), blk["norm1"]["scale"], blk["norm1"]["bias"],
        y0.shape[1] * y0.shape[2], 8, 1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(stats[0][0]), np.asarray(ref[0]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(stats[0][1]), np.asarray(ref[1]), rtol=1e-5, atol=1e-6
    )
