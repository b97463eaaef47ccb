"""naf_streamed parity: donated per-band execution and the fully-streamed
banded-encoder path must match the ordinary full forward (reference has no
streaming at all — its ceiling is 2048^2 features, README.md:98)."""

import jax
import jax.numpy as jnp
import numpy as np

from naf_tpu.api import naf_streamed
from naf_tpu.models.naf import NAF


def _setup():
    rng = np.random.RandomState(0)
    model = NAF(dim=128, heads_attn=2, heads_rope=2, kernel_size=5,
                img_layers=1)
    img = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(1, 16, 16, 96).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), img, feats, (64, 64))["params"]
    ref = model.apply({"params": params}, img, feats, (64, 64))
    return model, params, img, feats, ref


def test_streamed_matches_full():
    model, params, img, feats, ref = _setup()
    out = naf_streamed(
        model, params, img, feats, (64, 64), band_rows=16, interpret=True,
        stream_encoder=False,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4
    )


def test_streamed_banded_encoder_matches_full():
    """Full streaming: banded two-pass encoder + per-band attention. The
    full-resolution encoder output never exists."""
    model, params, img, feats, ref = _setup()
    out = naf_streamed(
        model, params, img, feats, (64, 64), band_rows=16, interpret=True,
        stream_encoder=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-4, rtol=5e-4
    )
