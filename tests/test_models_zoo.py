"""Baseline model zoo: shape contracts, JBF numerical parity vs kornia-free
torch reference formula, bicubic resize parity, registry coverage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from naf_tpu.models import ModelWrapper, build_model
from naf_tpu.ops.resize import resize_bicubic

UPSAMPLERS = ["Bilinear", "Nearest", "JAFAR", "FeatUp", "NAF"]
RESTORERS = ["IRCNN", "REDNet", "Restormer", "JBF", "JBU"]


def _data(hr=32, lr=8, c=16, seed=0):
    rng = np.random.RandomState(seed)
    img = jnp.asarray(rng.rand(1, hr, hr, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(1, lr, lr, c).astype(np.float32))
    return img, feats


@pytest.mark.parametrize("name", UPSAMPLERS)
def test_upsampler_contract(name):
    img, feats = _data()
    if name == "NAF":
        # default NAF kernel 9 needs bigger grids; use a small variant
        from naf_tpu.models import NAF

        m = NAF(dim=32, heads_attn=2, heads_rope=2, kernel_size=5, img_layers=1,
                na_impl="xla")
    else:
        m = build_model(name, embed_dim=16, ratio=4)
    params = m.init(jax.random.PRNGKey(0), img, feats, (32, 32))
    out = m.apply(params, img, feats, (32, 32))
    assert out.shape == (1, 32, 32, 16), (name, out.shape)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("name", RESTORERS)
def test_restorer_contract(name):
    rng = np.random.RandomState(0)
    noisy = jnp.asarray(rng.rand(1, 24, 24, 3).astype(np.float32))
    norm = (noisy - 0.45) / 0.22
    m = build_model(name, embed_dim=16, ratio=4)
    params = m.init(jax.random.PRNGKey(0), norm, noisy, (32, 32))
    out = m.apply(params, norm, noisy, (32, 32))
    assert out.shape == (1, 32, 32, 3), (name, out.shape)
    assert np.isfinite(np.asarray(out)).all()


def test_anyup_forward_and_window_locality():
    """AnyUp (reference wrapper src/model/anyup.py:8-15) forward contract +
    the windowed-attention property: a far-away feature perturbation cannot
    reach a query outside its (2*radius+1) window."""
    img, feats = _data(hr=64, lr=16)
    m = build_model("AnyUp")
    params = m.init(jax.random.PRNGKey(0), img, feats, (64, 64))
    out = m.apply(params, img, feats, (64, 64))
    assert out.shape == (1, 64, 64, 16)
    assert np.isfinite(np.asarray(out)).all()
    # perturb the bottom-right LR cell: the top-left query (cell (0,0),
    # window cells [0,7)x[0,7)) must be bit-identical.
    feats2 = feats.at[:, -1, -1].add(100.0)
    out2 = m.apply(params, img, feats2, (64, 64))
    np.testing.assert_array_equal(np.asarray(out[:, :4, :4]),
                                  np.asarray(out2[:, :4, :4]))
    assert not np.allclose(np.asarray(out[:, -4:, -4:]),
                           np.asarray(out2[:, -4:, -4:]))


def test_registry_wrapper_and_unknown():
    w = ModelWrapper("Bilinear", embed_dim=16, ratio=4)
    img, feats = _data()
    out = w(img, feats, (32, 32))
    assert out.shape == (1, 32, 32, 16)
    with pytest.raises(ValueError):
        build_model("NoSuchModel")


def test_bicubic_matches_torch():
    x = np.random.RandomState(0).randn(1, 3, 9, 11).astype(np.float32)
    for size in [(27, 33), (18, 22), (5, 7)]:
        want = F.interpolate(
            torch.from_numpy(x), size=size, mode="bicubic", align_corners=False
        ).numpy()
        got = resize_bicubic(jnp.asarray(x.transpose(0, 2, 3, 1)), size)
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4
        )


def test_jbf_matches_torch_reference_formula():
    """Joint bilateral blur vs a direct torch implementation of the kornia
    formula (unfold + gaussian space kernel + color kernel)."""
    from naf_tpu.models.jbf import joint_bilateral_blur

    rng = np.random.RandomState(1)
    inp = rng.rand(1, 3, 12, 12).astype(np.float32)
    guide = rng.rand(1, 3, 12, 12).astype(np.float32)
    ks, sc, ss = 5, 0.1, 1.5
    r = ks // 2

    ti, tg = torch.from_numpy(inp), torch.from_numpy(guide)
    gp = F.pad(tg, [r] * 4, mode="reflect")
    gw = F.unfold(gp, ks).reshape(1, 3, ks * ks, 12, 12)
    diff2 = ((gw - tg.unsqueeze(2)) ** 2).sum(1)
    color = torch.exp(-0.5 / sc ** 2 * diff2)
    ax = torch.arange(ks, dtype=torch.float32) - r
    g1 = torch.exp(-0.5 * (ax / ss) ** 2)
    space = (g1[:, None] * g1[None, :]).reshape(-1)
    space = space / space.sum()
    kernel = color * space[None, :, None, None]
    kernel = kernel / kernel.sum(1, keepdim=True)
    ip = F.pad(ti, [r] * 4, mode="reflect")
    iw = F.unfold(ip, ks).reshape(1, 3, ks * ks, 12, 12)
    want = (iw * kernel.unsqueeze(1)).sum(2).numpy()

    got = joint_bilateral_blur(
        jnp.asarray(inp.transpose(0, 2, 3, 1)),
        jnp.asarray(guide.transpose(0, 2, 3, 1)),
        ks, sc, ss,
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-5
    )


def test_featup_checkpoint_key_remap():
    """FeatUp hub-checkpoint conversion (reference utils/wrapper.py:22-28:
    keep upsampler.* / model.1.norm.*, rename model.1. -> norm.). The torch
    source tree is the actual reference FeatUp module (AdaptiveConv CUDA
    import stubbed), so the key naming is the released one verbatim."""
    import sys
    import types

    import torch

    for mod in ("extension", "extension.featup", "extension.featup.adaptive_conv_cuda",
                "extension.featup.adaptive_conv_cuda.adaptive_conv"):
        m = types.ModuleType(mod)
        if mod.endswith("adaptive_conv"):
            m.AdaptiveConv = object
        sys.modules.setdefault(mod, m)
    sys.modules["extension.featup.adaptive_conv_cuda.adaptive_conv"].AdaptiveConv = object
    if "natten" not in sys.modules:  # src.model.__init__ pulls in naf -> natten
        nat = types.ModuleType("natten")
        natf = types.ModuleType("natten.functional")
        natf.na2d_qk = natf.na2d_av = lambda *a, **k: None
        nat.functional = natf
        sys.modules["natten"] = nat
        sys.modules["natten.functional"] = natf
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_featup_mod", "/root/reference/src/model/featup.py"
    )
    # src.model.base import inside the file
    sys.path.insert(0, "/root/reference")
    try:
        ref_featup = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_featup)
        torch.manual_seed(0)
        ref = ref_featup.FeatUp(feature_dim=32, ratio=16)
        sd = ref.state_dict()
    finally:
        sys.path.remove("/root/reference")

    # hub layout: ChannelNorm lives at model.1 inside the trained wrapper
    hub = {"state_dict": {}}
    for k, v in sd.items():
        hub["state_dict"]["model.1." + k[len("norm."):] if k.startswith("norm.") else k] = v
    hub["state_dict"]["model.0.backbone.ignored"] = torch.zeros(1)  # dropped

    from naf_tpu.models.featup import featup_params_from_torch
    from naf_tpu.models.registry import ModelWrapper

    params = featup_params_from_torch(hub)
    w = ModelWrapper("FeatUp", embed_dim=32, ratio=16,
                     init_shapes=((1, 32, 32, 3), (1, 2, 2, 32), (32, 32)))
    ref_shapes = jax.tree.map(lambda a: a.shape, w.params)
    got_shapes = jax.tree.map(lambda a: a.shape, params)
    assert ref_shapes == got_shapes

    w2 = ModelWrapper("FeatUp", embed_dim=32, ratio=16, ckpt_params=params)
    out = w2(jnp.zeros((1, 32, 32, 3)), jnp.ones((1, 2, 2, 32)), (32, 32))
    assert out.shape == (1, 32, 32, 32)
    assert bool(jnp.isfinite(out).all())


def test_anyup_convert_checkpoint_roundtrip():
    """AnyUp converter (models/anyup.py:convert_checkpoint): a synthetically
    keyed torch-layout state dict (OIHW convs, GroupNorm weight/bias under
    the encoder()-Sequential naming) converts to the exact AnyUpsampler
    param tree. No hub checkpoint is reachable in this environment, so this
    validates the key map + shape checks the converter will apply to a real
    wimmerth/anyup download (reference wrapper src/model/anyup.py:8-15)."""
    from naf_tpu.models.anyup import AnyUpsampler, convert_checkpoint

    m = AnyUpsampler(dim=32, groups=4, radius=1, img_layers=2)
    img, feats = _data(hr=32, lr=8)
    variables = m.init(jax.random.PRNGKey(1), img, feats, (32, 32))
    want = variables["params"]

    # Build the torch-side state dict from the flax tree (kernel HWIO->OIHW).
    rng = np.random.RandomState(3)
    state = {}

    def _emit(prefix, tree):
        state[f"{prefix}.weight"] = np.transpose(
            rng.randn(*tree["conv"]["kernel"].shape).astype(np.float32),
            (3, 2, 0, 1))
        state[f"{prefix}.bias"] = rng.randn(
            *tree["conv"]["bias"].shape).astype(np.float32)

    _emit("encoder.0", want["encoder"]["stem"])
    for i in (0, 1):
        b = want["encoder"][f"block{i}"]
        t = f"encoder.{i + 1}"
        for n in ("norm1", "norm2"):
            state[f"{t}.{n}.weight"] = rng.randn(32).astype(np.float32)
            state[f"{t}.{n}.bias"] = rng.randn(32).astype(np.float32)
        _emit(f"{t}.conv1", b["conv1"])
        _emit(f"{t}.conv2", b["conv2"])

    got = convert_checkpoint(state)
    # tree structure matches the model's init tree exactly
    assert jax.tree_util.tree_structure(
        jax.tree.map(jnp.shape, got)
    ) == jax.tree_util.tree_structure(jax.tree.map(jnp.shape, want))
    assert jax.tree.map(jnp.shape, got) == jax.tree.map(jnp.shape, want)
    # layout conversion is the transpose inverse
    np.testing.assert_array_equal(
        got["encoder"]["stem"]["conv"]["kernel"],
        np.transpose(state["encoder.0.weight"], (2, 3, 1, 0)))
    # converted params run through the model
    out = m.apply({"params": jax.tree.map(jnp.asarray, got)},
                  img, feats, (32, 32))
    assert out.shape == (1, 32, 32, 16)
    assert np.isfinite(np.asarray(out)).all()

    # loud failures: unconsumed keys and shape drift
    with pytest.raises(KeyError, match="not consumed"):
        convert_checkpoint({**state, "decoder.0.weight": state["encoder.0.weight"]})
    bad = dict(state)
    bad["encoder.1.conv1.weight"] = rng.randn(32, 16, 3, 3).astype(np.float32)
    with pytest.raises(ValueError, match="conv1"):
        convert_checkpoint(bad)
