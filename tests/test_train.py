"""Training-loop smoke tests: loss decreases, checkpoint round-trips, DP mesh."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from naf_tpu.backbones import PretrainedViTWrapper
from naf_tpu.models import NAF
from naf_tpu.train.losses import Loss, mse_loss
from naf_tpu.train.distill import round_to_nearest_multiple, sample_lr_size
from naf_tpu.train.trainer import (
    TrainConfig, make_train_step, train_upsampler, load_checkpoint,
)


def test_loss_semantics():
    pred = jnp.ones((2, 4, 4, 8))
    target = jnp.zeros((2, 4, 4, 8))
    out = Loss("mse")(pred, target)
    assert float(out["total"]) == 1.0
    # normalized branch matches reference formula (src/loss.py:12-23)
    t = jnp.asarray(np.random.RandomState(0).randn(1, 2, 2, 4).astype(np.float32))
    p = t + 0.1
    v = mse_loss(p, t, normalize=True)
    assert np.isfinite(float(v))
    with pytest.raises(NotImplementedError):
        Loss("l1")


def test_lr_size_sampling():
    assert round_to_nearest_multiple(100, 14) == 98
    assert sample_lr_size((512, 512), 14, "fixed") == (252, 252)
    rng = np.random.RandomState(0)
    h, w = sample_lr_size((512, 512), 14, "random", rng)
    assert h % 14 == 0 and 512 * 0.2 < h < 512 * 0.65


def _image_iter(batch, size, seed=0):
    rng = np.random.RandomState(seed)
    while True:
        yield rng.rand(batch, size, size, 3).astype(np.float32)


def test_train_smoke_loss_decreases(tmp_path):
    backbone = PretrainedViTWrapper(
        "vit_small_patch14_dinov2.lvd142m", num_heads=2
    )
    # shrink the random backbone for speed
    model = NAF(dim=32, heads_attn=2, heads_rope=2, kernel_size=5, img_layers=1,
                na_impl="xla")
    cfg = TrainConfig(
        train_steps=6, img_size=224, batch_size=2, use_bf16=False,
        log_every=1, log_dir=str(tmp_path), lr=1e-3,
    )
    params = train_upsampler(model, backbone, _image_iter(2, 224), cfg)
    import json

    recs = [json.loads(l) for l in open(tmp_path / "version_0" / "metrics.jsonl")]
    assert len(recs) == 6
    assert recs[-1]["loss"] < recs[0]["loss"] * 1.5  # moving, not diverging

    assert (tmp_path / "version_0" / "ckpt_6").exists()  # checkpoint written


def test_train_step_resamples_rope_augmentation():
    """Two steps from identical state must apply different coordinate
    augmentations (reference resamples per forward, src/layers/rope.py:107-124).
    With a constant key the losses below would be bit-identical."""
    import optax

    backbone = PretrainedViTWrapper(
        "vit_small_patch14_dinov2.lvd142m", num_heads=2
    )
    model = NAF(dim=32, heads_attn=2, heads_rope=2, kernel_size=5, img_layers=1,
                na_impl="xla")  # rope_rescale defaults to 2.0 (augmented)
    rng = np.random.RandomState(0)
    img = rng.rand(1, 224, 224, 3).astype(np.float32)
    init = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 8, 8, backbone.embed_dim)),
        (64, 64),
    )["params"]
    tx = optax.adamw(1e-3)
    opt_state = tx.init(init)
    step_fn = make_train_step(model, backbone, tx, use_bf16=False, seed=0)

    x = jnp.asarray(img)
    args = (init, opt_state, x, x)
    hr_hw = (224 // backbone.patch_size, 224 // backbone.patch_size)
    kw = dict(lr_size=(112, 112), out_hw=hr_hw, crop_hw=(224, 224))
    _, _, loss0 = step_fn(*args, jnp.int32(0), **kw)
    _, _, loss1 = step_fn(*args, jnp.int32(1), **kw)
    _, _, loss0b = step_fn(*args, jnp.int32(0), **kw)
    assert float(loss0) != float(loss1), "augmentation key constant across steps"
    assert float(loss0) == float(loss0b), "step key not deterministic"


def test_train_chunked_dispatch_matches_per_step(tmp_path):
    """The scanned-dispatch path (device_stack: log_every steps per
    dispatch via lax.scan, the tunnel-latency workaround for 25k-step
    reference-budget runs) must reproduce the per-step loop exactly when
    the schedule is deterministic (one image, fixed down_factor — same
    step-index RoPE keys, same batches)."""
    backbone = PretrainedViTWrapper(
        "vit_small_patch14_dinov2.lvd142m", num_heads=2
    )
    model = NAF(dim=32, heads_attn=2, heads_rope=2, kernel_size=5,
                img_layers=1, na_impl="xla")
    rng = np.random.RandomState(0)
    img = rng.rand(1, 224, 224, 3).astype(np.float32)

    def cfg(name):
        return TrainConfig(
            train_steps=3, img_size=224, batch_size=1, use_bf16=False,
            down_factor="fixed", log_every=2, ckpt_every=100,
            log_dir=str(tmp_path / name), lr=1e-3, seed=0, viz_every=0,
        )

    def per_step():
        while True:
            yield img

    p_ref = train_upsampler(model, backbone, per_step(), cfg("step"))
    stack = jnp.asarray(img)
    p_chunk = train_upsampler(
        model, backbone, None, cfg("chunk"), device_stack=stack
    )
    a = np.asarray(jax.tree.leaves(p_ref)[0], np.float32)
    b = np.asarray(jax.tree.leaves(p_chunk)[0], np.float32)
    np.testing.assert_allclose(b, a, atol=1e-5, rtol=1e-4)


def test_train_viz_panel_written(tmp_path):
    """Qualitative PCA panels land next to metrics.jsonl during training
    (reference logs TB image panels; here PNGs, utils/visualization.py)."""
    import glob

    backbone = PretrainedViTWrapper(
        "vit_small_patch14_dinov2.lvd142m", num_heads=2
    )
    model = NAF(dim=32, heads_attn=2, heads_rope=2, kernel_size=5,
                img_layers=1, na_impl="xla")
    cfg = TrainConfig(
        train_steps=1, img_size=224, batch_size=1, use_bf16=True,
        log_every=1, log_dir=str(tmp_path), lr=1e-3, viz_every=1,
    )
    train_upsampler(model, backbone, _image_iter(1, 224), cfg)
    panels = glob.glob(str(tmp_path) + "/**/panel_step*.png", recursive=True)
    assert panels, "no viz panel written"


def test_train_cli_mesh_selection():
    """train.py's mesh flag: auto uses all devices when the batch divides,
    falls back to single-device otherwise; data forces (or errors); none
    disables (reference semantics: single device, train.py:55,68)."""
    import pytest

    from train import build_mesh

    n = len(jax.devices())
    assert n >= 8, "CPU mesh fixture"
    m = build_mesh("auto", batch_size=8)
    assert m is not None and m.shape["data"] == n
    assert build_mesh("auto", batch_size=3) is None  # indivisible -> 1-dev
    assert build_mesh("none", batch_size=8) is None
    with pytest.raises(ValueError):
        build_mesh("data", batch_size=3)


def test_train_dp_mesh_matches_single_device(tmp_path):
    """DP over the CPU mesh must reproduce the single-device trajectory
    (replicated params + sharded batch + mean loss is the same program, up
    to cross-device reduction order — hence f32 and a short horizon; bf16
    grads make Adam's near-sign updates amplify last-bit psum differences
    into O(lr) param deltas)."""
    import json

    from train import build_mesh

    backbone = PretrainedViTWrapper(
        "vit_small_patch14_dinov2.lvd142m", num_heads=2
    )
    model = NAF(dim=32, heads_attn=2, heads_rope=2, kernel_size=5,
                img_layers=1, na_impl="xla")

    def run(mesh, name):
        log_dir = str(tmp_path / name)
        cfg = TrainConfig(
            train_steps=2, img_size=224, batch_size=8, use_bf16=False,
            log_every=1, ckpt_every=100, log_dir=log_dir,
            lr=1e-3, seed=0,
        )
        params = train_upsampler(
            model, backbone, _image_iter(8, 224), cfg, mesh=mesh
        )
        import glob

        metrics = sorted(glob.glob(log_dir + "/**/metrics.jsonl",
                                   recursive=True))
        losses = [
            json.loads(l)["loss"]
            for m in metrics for l in open(m) if l.strip()
        ]
        return params, losses

    p1, losses1 = run(None, "single")
    p8, losses8 = run(build_mesh("data", batch_size=8), "dp")
    assert len(losses1) == len(losses8) >= 2
    np.testing.assert_allclose(losses8, losses1, rtol=1e-4)
    l1 = jax.tree.leaves(p1)[0]
    l8 = jax.tree.leaves(p8)[0]
    np.testing.assert_allclose(
        np.asarray(l8, np.float32), np.asarray(l1, np.float32),
        atol=5e-4, rtol=1e-3,
    )


def test_train_dp_mesh(tmp_path):
    from jax.sharding import Mesh

    devices = np.array(jax.devices()[:4])
    mesh = Mesh(devices, ("data",))
    backbone = PretrainedViTWrapper(
        "vit_small_patch14_dinov2.lvd142m", num_heads=2
    )
    model = NAF(dim=32, heads_attn=2, heads_rope=2, kernel_size=5, img_layers=1,
                na_impl="xla")
    cfg = TrainConfig(
        train_steps=2, img_size=224, batch_size=4, use_bf16=True,
        log_every=1, log_dir=str(tmp_path), lr=1e-3,
    )
    with mesh:
        params = train_upsampler(
            model, backbone, _image_iter(4, 224), cfg, mesh=mesh
        )
    assert params is not None
