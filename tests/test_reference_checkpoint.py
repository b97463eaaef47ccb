"""Converter validation against the REFERENCE's exact module tree.

The released checkpoint (`naf_release.pth`, hubconf.py:20-24) is a
`state_dict()` of the reference `src.model.naf.NAF` class. There is no
network egress here, so we replicate the released key naming *verbatim* by
instantiating the reference class itself (natten stubbed in sys.modules —
its attention carries no parameters, src/layers/attentions.py:32-46) and
round-tripping its state dict through the shipping converter + API:

1. every state-dict key must be consumed (strict converter accounting) —
   this test fails if the release carries a key the converter would drop;
2. the recomputed `rope.periods` constant must match the checkpoint buffer;
3. the converted params must reproduce the reference pipeline's output
   (encoder/rope/pools run through the actual reference modules; the
   natten attention collapsed to the per-cell-window numpy oracle proved
   equivalent in tests/test_window.py) at cosine > 0.999.
"""

import importlib
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from naf_tpu.api import naf, load_naf_params
from naf_tpu.convert import naf_params_from_torch
from tests.test_golden_production import _reference_attention

REFERENCE = "/root/reference"
DIM, HEADS, KERNEL = 256, 4, 9
H = W = 224
HK = WK = 28
FEAT_C = 384


@pytest.fixture(scope="module")
def ref_naf_module():
    """Import src.model.naf from the reference tree with natten stubbed."""
    stub = types.ModuleType("natten")
    functional = types.ModuleType("natten.functional")

    def _unavailable(*a, **k):  # state_dict/shape work never calls natten
        raise RuntimeError("natten stub: attention must not be executed")

    functional.na2d_qk = _unavailable
    functional.na2d_av = _unavailable
    stub.functional = functional
    saved = {
        name: sys.modules.get(name)
        for name in ("natten", "natten.functional")
    }
    sys.modules["natten"] = stub
    sys.modules["natten.functional"] = functional
    sys.path.insert(0, REFERENCE)
    try:
        yield importlib.import_module("src.model.naf")
    finally:
        sys.path.remove(REFERENCE)
        for name, mod in saved.items():
            if mod is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = mod


def test_released_state_dict_keys_fully_consumed(ref_naf_module):
    torch.manual_seed(3)
    ref = ref_naf_module.NAF()  # release defaults: dim 256, k 9, 2 layers
    sd = ref.state_dict()
    # the released tree: two conv stacks + the persistent periods buffer
    assert "image_encoder.encoder.0.weight" in sd
    assert "image_encoder.sem_encoder.1.norm1.weight" in sd
    assert "image_encoder.rope.periods" in sd

    params = naf_params_from_torch(sd)  # strict=True: raises on leftovers
    leaves = jax.tree.leaves(params)
    n_converted = sum(int(np.prod(l.shape)) for l in leaves)
    n_ref = sum(int(v.numel()) for k, v in sd.items() if k != "image_encoder.rope.periods")
    assert n_converted == n_ref

    # an extra key (as a future release variant would add) must raise
    sd2 = dict(sd)
    sd2["image_encoder.extra.weight"] = torch.zeros(1)
    with pytest.raises(KeyError, match="extra"):
        naf_params_from_torch(sd2)

    # a tampered periods buffer must be caught, not silently recomputed over
    sd3 = dict(sd)
    sd3["image_encoder.rope.periods"] = sd["image_encoder.rope.periods"] * 2
    with pytest.raises(ValueError, match="periods"):
        naf_params_from_torch(sd3)


@pytest.mark.slow
def test_reference_class_roundtrip_golden(ref_naf_module):
    torch.manual_seed(7)
    ref = ref_naf_module.NAF()
    ref.eval()
    rng = np.random.RandomState(5)
    img = rng.randn(1, 3, H, W).astype(np.float32)
    feats = (rng.randn(1, FEAT_C, HK, WK) * 0.5).astype(np.float32)

    with torch.no_grad():
        x = ref.image_encoder(torch.from_numpy(img), (H, W))
        q = ref.query_encoder(x)
        k = ref.key_encoder(x, torch.from_numpy(feats))

    def heads_last(a, n):
        c = a.shape[0]
        return a.reshape(n, c // n, a.shape[1], a.shape[2]).transpose(2, 3, 0, 1)

    want = _reference_attention(
        heads_last(q.numpy()[0], HEADS),
        heads_last(k.numpy()[0], HEADS),
        heads_last(feats[0], HEADS),
        KERNEL,
        (DIM // HEADS) ** -0.5,
    )

    model, _ = load_naf_params()
    params = jax.tree.map(jnp.asarray, naf_params_from_torch(ref.state_dict()))
    got = naf(model, params, img, feats, (H, W))
    got = np.asarray(got)[0].transpose(1, 2, 0)

    cos = float(
        np.sum(got * want) / (np.linalg.norm(got) * np.linalg.norm(want) + 1e-12)
    )
    assert cos > 0.999, cos
    np.testing.assert_allclose(got, want, atol=5e-3)
