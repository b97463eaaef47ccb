"""NAF upsampler training loop (reference train.py:30-174, TPU-native).

Self-distillation: hr_feats = backbone(image); lr_feats =
backbone(downscaled image); the model predicts hr_feats from
(image, lr_feats) with MSE (train.py:120-137). Differences by design:

- optax AdamW + jit'd train step; bf16 via a compute-dtype cast of params
  and activations (the torch version uses autocast, train.py:120).
- Data parallelism over the batch via jax.sharding (the reference is
  single-GPU; SURVEY §2.10).
- Checkpoints via orbax, saved every total/4 steps like the reference
  (train.py:161-167) but including optimizer state so resume is exact.
- Metrics stream to JSONL (+ stdout) instead of TensorBoard.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from naf_tpu.ops.resize import resize_bilinear
from naf_tpu.train.distill import sample_lr_size
from naf_tpu.train.losses import mse_loss

__all__ = ["TrainConfig", "train_upsampler", "make_train_step"]


@dataclasses.dataclass
class TrainConfig:
    train_steps: int = 25_000  # config/base.yaml:11
    img_size: int = 512  # config/base.yaml (train img size)
    lr: float = 2e-4  # config/optimizer/adamw.yaml
    weight_decay: float = 1e-4
    batch_size: int = 4  # config/dataloader/train.yaml
    down_factor: str = "fixed"  # "fixed" (0.5) | "random" (U(0.25, 0.60))
    use_bf16: bool = True
    use_checkpointing: bool = False  # rematerialize the model forward
    log_every: int = 100  # train.py:27 FREQ
    ckpt_every: Optional[int] = None  # default: train_steps // 4
    viz_every: Optional[int] = None  # default: ckpt_every; 0 disables
    log_dir: str = "runs/naf"
    seed: int = 0
    data_axis: str = "data"


def make_train_step(model, backbone_apply, tx, use_bf16: bool,
                    use_checkpointing: bool = False, seed: int = 0):
    """Returns jit'd (params, opt_state, image_ups, image_back, step_idx,
    lr_size, out_hw, crop_hw) -> (params, opt_state, loss). Static over
    lr_size (bounded set of sizes); step_idx is traced so no recompiles.

    The RoPE coordinate augmentation key is derived per step by folding
    step_idx into PRNGKey(seed) — the reference resamples augmentations every
    forward (src/layers/rope.py:107-124), which is what NAF's zero-shot scale
    generalization relies on.

    use_checkpointing rematerializes the model forward in the backward pass
    (the TPU analogue of the reference's gradient-checkpointing monkey-patch,
    utils/training.py:158-184)."""

    def step(params, opt_state, image_ups, image_back, step_idx, lr_size,
             out_hw, crop_hw):
        return _upsampler_step_core(
            model, backbone_apply, tx, use_bf16, use_checkpointing, seed,
            params, opt_state, image_ups, image_back, step_idx, lr_size,
            out_hw, crop_hw,
        )

    return jax.jit(step, static_argnames=("lr_size", "out_hw", "crop_hw"))


def _upsampler_step_core(model, backbone_apply, tx, use_bf16,
                         use_checkpointing, seed, params, opt_state,
                         image_ups, image_back, step_idx, lr_size, out_hw,
                         crop_hw):
    """One distillation train step (traceable; shared by the per-step jit
    and the scanned-dispatch chunk)."""
    dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    step_rng = jax.random.fold_in(jax.random.PRNGKey(seed), step_idx)

    # frozen backbone targets (no_grad; train.py:123)
    hr_feats = backbone_apply(image_back.astype(dtype))
    lr_image = resize_bilinear(image_back, lr_size).astype(dtype)
    lr_feats = backbone_apply(lr_image)
    hr_feats = jax.lax.stop_gradient(hr_feats)
    lr_feats = jax.lax.stop_gradient(lr_feats)

    # model input image: min(224, 4 * hr_size) (train.py:126)
    img_hr = resize_bilinear(image_ups, crop_hw).astype(dtype)

    def forward(p_c, img_hr, lr_feats):
        return model.apply(
            {"params": p_c}, img_hr, lr_feats, out_hw, train=True,
            rng=step_rng,
        )

    fwd = jax.checkpoint(forward) if use_checkpointing else forward

    def loss_fn(p):
        p_c = jax.tree.map(lambda a: a.astype(dtype), p)
        return mse_loss(fwd(p_c, img_hr, lr_feats), hr_feats)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def make_train_chunk(model, backbone_apply, tx, use_bf16: bool,
                     use_checkpointing: bool = False, seed: int = 0,
                     imagenet_stats=None, backbone_stats=None):
    """K train steps in ONE dispatch: lax.scan over (K, B) batch indices
    gathered from a device-resident image stack (naf_tpu/data/
    device_cache.py). Through the device tunnel the per-step dispatch costs
    ~0.5 s regardless of model size, so a 25k-step reference-budget run
    (config/base.yaml:11-12) is only practical with chunked dispatch.

    lr_size is static per chunk (scan bodies need uniform shapes), so the
    random down_factor is resampled per CHUNK rather than per step — a
    coarser draw of the same distribution (reference utils/training.py:
    28-50 samples per step)."""
    (im_mean, im_std) = imagenet_stats
    (b_mean, b_std) = backbone_stats

    def chunk(params, opt_state, stack, idx, step0, lr_size, out_hw,
              crop_hw):
        def body(carry, xs):
            params, opt_state = carry
            idx_b, i = xs
            img = jnp.take(stack, idx_b, axis=0)
            image_ups = (img - im_mean) / im_std
            image_back = (img - b_mean) / b_std
            params, opt_state, loss = _upsampler_step_core(
                model, backbone_apply, tx, use_bf16, use_checkpointing,
                seed, params, opt_state, image_ups, image_back, step0 + i,
                lr_size, out_hw, crop_hw,
            )
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state),
            (idx, jnp.arange(idx.shape[0], dtype=jnp.int32)),
        )
        return params, opt_state, losses

    return jax.jit(
        chunk, donate_argnums=(0, 1),
        static_argnames=("lr_size", "out_hw", "crop_hw"),
    )


def fold_step_key(seed: int, step: int) -> jax.Array:
    """The per-step augmentation key the train step derives internally."""
    return jax.random.fold_in(jax.random.PRNGKey(seed), step)


def make_viz_fn(model, backbone_apply, use_bf16: bool):
    """jit'd (params, image_ups, image_back, lr_size, out_hw, crop_hw) ->
    (hr_feats, lr_feats, pred) for qualitative panels — the distillation
    triple at eval time (train=False, no coordinate augmentation). The
    reference logs image panels to TensorBoard during training
    (denoising.py:218-222; scalars train.py:139-158); here panels land as
    PNGs next to metrics.jsonl."""

    def viz(params, image_ups, image_back, lr_size, out_hw, crop_hw):
        dtype = jnp.bfloat16 if use_bf16 else jnp.float32
        hr_feats = backbone_apply(image_back.astype(dtype))
        lr_feats = backbone_apply(resize_bilinear(image_back, lr_size).astype(dtype))
        img_hr = resize_bilinear(image_ups, crop_hw).astype(dtype)
        p_c = jax.tree.map(lambda a: a.astype(dtype), params)
        pred = model.apply({"params": p_c}, img_hr, lr_feats, out_hw)
        return hr_feats, lr_feats, pred

    return jax.jit(viz, static_argnames=("lr_size", "out_hw", "crop_hw"))


def write_viz_panel(log_dir, step, image, hr_feats, lr_feats, pred):
    """[image | PCA(lr) | PCA(pred) | PCA(hr target)] -> PNG. Joint PCA so
    colors are comparable across panels (utils/visualization.py)."""
    from naf_tpu.utils.visualization import plot_feats

    path = os.path.join(log_dir, f"panel_step{step:07d}.png")
    plot_feats(
        np.asarray(image[0], np.float32),
        [
            np.asarray(lr_feats[0], np.float32),
            np.asarray(pred[0], np.float32),
            np.asarray(hr_feats[0], np.float32),
        ],
        path=path,
    )
    return path


def train_upsampler(
    model,
    backbone,
    data_iter: Optional[Iterator[np.ndarray]],
    cfg: TrainConfig,
    params=None,
    mesh=None,
    device_stack=None,
):
    """Train `model` against frozen `backbone` on images from `data_iter`
    (NHWC float [0,1], shape (B, img_size, img_size, 3)). Returns params.

    `mesh`: optional jax Mesh with a `cfg.data_axis` axis for DP; params are
    replicated, batches sharded along it.

    `device_stack`: optional (N, img_size, img_size, 3) float32 [0,1] stack
    resident on device (naf_tpu.data.device_cached_stack): training then
    runs `log_every` steps per dispatch via lax.scan with on-device batch
    gathers — through the device tunnel the per-step dispatch (~0.5 s)
    otherwise dominates, making the reference's 25k-step budget
    (config/base.yaml:11-12) impractical. lr_size is resampled per chunk
    (see make_train_chunk). Mutually exclusive with `mesh`.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.RandomState(cfg.seed)
    imagenet_mean = np.array([0.485, 0.456, 0.406], np.float32)
    imagenet_std = np.array([0.229, 0.224, 0.225], np.float32)
    bmean = np.array(backbone.config["mean"], np.float32)
    bstd = np.array(backbone.config["std"], np.float32)

    if params is None:
        init_img = jnp.zeros((1, 64, 64, 3), jnp.float32)
        init_feat = jnp.zeros((1, 16, 16, backbone.embed_dim), jnp.float32)
        params = model.init(
            jax.random.PRNGKey(cfg.seed), init_img, init_feat, (64, 64)
        )["params"]

    tx = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
    opt_state = tx.init(params)
    step_fn = make_train_step(
        model, backbone, tx, cfg.use_bf16, cfg.use_checkpointing, seed=cfg.seed
    )

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        shard = NamedSharding(mesh, P(cfg.data_axis))
        params = jax.device_put(params, repl)
        opt_state = jax.device_put(opt_state, repl)

    log_dir = versioned_dir(cfg.log_dir)
    metrics_path = os.path.join(log_dir, "metrics.jsonl")
    ckpt_every = cfg.ckpt_every or max(cfg.train_steps // 4, 1)
    viz_every = ckpt_every if cfg.viz_every is None else cfg.viz_every
    viz_fn = (
        make_viz_fn(model, backbone, cfg.use_bf16) if viz_every else None
    )
    ps = backbone.patch_size
    losses = []
    t0 = time.time()

    if device_stack is not None:
        if mesh is not None:
            raise ValueError("device_stack and mesh are mutually exclusive")
        chunk_fn = make_train_chunk(
            model, backbone, tx, cfg.use_bf16, cfg.use_checkpointing,
            seed=cfg.seed,
            imagenet_stats=(jnp.asarray(imagenet_mean), jnp.asarray(imagenet_std)),
            backbone_stats=(jnp.asarray(bmean), jnp.asarray(bstd)),
        )
        n = int(device_stack.shape[0])
        img_hw = tuple(int(v) for v in device_stack.shape[1:3])
        hr_hw = (img_hw[0] // ps, img_hw[1] // ps)
        crop_hw = tuple(min(224, 4 * v) for v in hr_hw)

        def idx_stream():
            order = np.arange(n)
            while True:
                if cfg.batch_size > n:
                    yield rng.randint(0, n, size=cfg.batch_size)
                    continue
                rng.shuffle(order)
                for i in range(0, n - cfg.batch_size + 1, cfg.batch_size):
                    yield order[i : i + cfg.batch_size]

        stream = idx_stream()
        done = 0
        with open(metrics_path, "a") as mf:
            while done < cfg.train_steps:
                k = min(max(cfg.log_every, 1), cfg.train_steps - done)
                idx = np.stack([next(stream) for _ in range(k)])
                lr_size = sample_lr_size(img_hw, ps, cfg.down_factor, rng)
                params, opt_state, chunk_losses = chunk_fn(
                    params, opt_state, device_stack,
                    jnp.asarray(idx, jnp.int32), jnp.int32(done),
                    lr_size, hr_hw, crop_hw,
                )
                done += k
                loss_v = float(chunk_losses[-1])
                losses.append(loss_v)
                rec = {
                    "step": done - 1,
                    "loss": loss_v,
                    "lr_size": list(lr_size),
                    "elapsed_s": round(time.time() - t0, 1),
                }
                mf.write(json.dumps(rec) + "\n")
                mf.flush()
                print(f"step {done}/{cfg.train_steps} loss {loss_v:.5f}",
                      flush=True)
                if viz_fn is not None and (
                    done % max(viz_every, 1) < k or done >= cfg.train_steps
                ):
                    try:
                        img = jnp.take(
                            device_stack,
                            jnp.asarray(idx[-1], jnp.int32), axis=0,
                        )
                        hr_f, lr_f, pred = viz_fn(
                            params,
                            (img - imagenet_mean) / imagenet_std,
                            (img - bmean) / bstd,
                            lr_size, hr_hw, crop_hw,
                        )
                        write_viz_panel(
                            log_dir, done, np.asarray(img), hr_f, lr_f, pred
                        )
                    except Exception as e:  # viz must never kill a run
                        print(f"viz panel failed at step {done}: {e}")
                if done % ckpt_every < k or done >= cfg.train_steps:
                    save_checkpoint(log_dir, done, params, opt_state)
        return params

    with open(metrics_path, "a") as mf:
        for step in range(cfg.train_steps):
            batch = next(data_iter)  # (B, H, W, 3) in [0, 1]
            # Normalize on device: a host batch uploads once (not twice),
            # and a device-cached batch (data/device_cache.py) never leaves
            # the chip — host<->device traffic rides a tunnel here.
            img = jnp.asarray(batch, jnp.float32)
            img_ups = (img - imagenet_mean) / imagenet_std
            img_back = (img - bmean) / bstd

            lr_size = sample_lr_size(
                img.shape[1:3], ps, cfg.down_factor, rng
            )
            hr_hw = (img.shape[1] // ps, img.shape[2] // ps)
            crop_hw = tuple(min(224, 4 * v) for v in hr_hw)

            x_ups, x_back = img_ups, img_back
            if mesh is not None:
                x_ups = jax.device_put(x_ups, shard)
                x_back = jax.device_put(x_back, shard)

            params, opt_state, loss = step_fn(
                params, opt_state, x_ups, x_back, jnp.int32(step),
                lr_size, hr_hw, crop_hw
            )

            if step % cfg.log_every == 0:
                loss_v = float(loss)
                losses.append(loss_v)
                rec = {
                    "step": step,
                    "loss": loss_v,
                    "lr_size": list(lr_size),
                    "elapsed_s": round(time.time() - t0, 1),
                }
                mf.write(json.dumps(rec) + "\n")
                mf.flush()
                print(f"step {step}/{cfg.train_steps} loss {loss_v:.5f}")

            if viz_fn is not None and (
                (step + 1) % viz_every == 0 or step + 1 == cfg.train_steps
            ):
                try:
                    hr_f, lr_f, pred = viz_fn(
                        params, x_ups, x_back, lr_size, hr_hw, crop_hw
                    )
                    write_viz_panel(
                        log_dir, step + 1, np.asarray(img), hr_f, lr_f, pred
                    )
                except Exception as e:  # viz must never kill a run
                    print(f"viz panel failed at step {step + 1}: {e}")

            if (step + 1) % ckpt_every == 0 or step + 1 == cfg.train_steps:
                save_checkpoint(log_dir, step + 1, params, opt_state)

    return params


def versioned_dir(base: str) -> str:
    """`base/version_N` with N = max existing + 1 (reference
    utils/training.py:53-65 logger semantics)."""
    os.makedirs(base, exist_ok=True)
    versions = [
        int(d.split("_")[-1])
        for d in os.listdir(base)
        if d.startswith("version_") and d.split("_")[-1].isdigit()
    ]
    path = os.path.join(base, f"version_{max(versions, default=-1) + 1}")
    os.makedirs(path, exist_ok=True)
    return path


def save_checkpoint(log_dir: str, step: int, params, opt_state=None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(log_dir, f"ckpt_{step}"))
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str, template):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
