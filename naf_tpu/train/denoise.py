"""Denoising/restoration training loop (reference denoising.py:180-421).

Model contract: `model(noisy_norm, noisy, (H, W)) -> denoised` (NAF treats the
noisy image itself as the "features" input, denoising.py:212-213; the
restorers predict the noise residual). Loss: w1*L1 + w2*L2 + w_ssim*(1-SSIM).
Validation reports PSNR/SSIM on clamped outputs.
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

from naf_tpu.evals.denoising import DenoisingLoss, NoiseGenerator, psnr, ssim
from naf_tpu.ops.resize import resize_bilinear

__all__ = ["DenoiseConfig", "train_denoiser", "validate_denoiser"]

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclasses.dataclass
class DenoiseConfig:
    train_steps: int = 25_000
    val_steps: int = 100
    img_size: int = 448
    lr: float = 2e-4
    weight_decay: float = 1e-5
    noise_type: str = "gaussian"
    noise_params: Optional[dict] = None
    l1_weight: float = 1.0
    l2_weight: float = 5.0
    ssim_weight: float = 0.2
    use_bf16: bool = True
    log_every: int = 50
    log_dir: str = "runs/denoise"
    seed: int = 0


def _step_core(model, tx, criterion, noise_gen, noise_params, img_hw, dtype,
               params, opt_state, clean, rng):
    noisy = noise_gen(rng, clean, noise_params)
    noisy_norm = (noisy - _IMAGENET_MEAN) / _IMAGENET_STD

    def loss_fn(p):
        p_c = jax.tree.map(lambda a: a.astype(dtype), p)
        pred = model.apply(
            {"params": p_c}, noisy_norm.astype(dtype), noisy.astype(dtype),
            img_hw,
        )
        return criterion(pred, clean)["total"]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def _make_step(model, tx, criterion, noise_gen, noise_params, img_hw, use_bf16):
    dtype = jnp.bfloat16 if use_bf16 else jnp.float32

    @jax.jit
    def step(params, opt_state, clean, rng):
        return _step_core(model, tx, criterion, noise_gen, noise_params,
                          img_hw, dtype, params, opt_state, clean, rng)

    return step


def _make_chunk(model, tx, criterion, noise_gen, noise_params, img_hw,
                use_bf16):
    """K train steps in one dispatch: lax.scan over (K, B) batch indices
    gathered from a device-resident image stack. One host->device round
    trip per K steps instead of two per step — through the device tunnel
    the per-step dispatch otherwise dominates small-model training."""
    dtype = jnp.bfloat16 if use_bf16 else jnp.float32

    def chunk(params, opt_state, stack, idx, key0):
        def body(carry, xs):
            params, opt_state = carry
            idx_b, i = xs
            clean = jnp.take(stack, idx_b, axis=0)
            rng = jax.random.fold_in(key0, i)
            params, opt_state, loss = _step_core(
                model, tx, criterion, noise_gen, noise_params, img_hw,
                dtype, params, opt_state, clean, rng)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state),
            (idx, jnp.arange(idx.shape[0], dtype=jnp.int32)))
        return params, opt_state, losses

    return jax.jit(chunk, donate_argnums=(0, 1))


def train_denoiser(model, data_iter: Optional[Iterator[np.ndarray]],
                   cfg: DenoiseConfig, params=None, *,
                   device_stack=None, batch_size: Optional[int] = None):
    """Train; data_iter yields clean (B, H, W, 3) float [0, 1] batches.

    Alternatively pass `device_stack` ((N, H, W, 3) float32 on device, see
    naf_tpu.data.device_cached_stack) plus `batch_size`: training then runs
    `log_every` steps per dispatch via lax.scan with on-device batch
    gathers — same epoch-permutation semantics, ~one host round trip per
    chunk instead of two per step."""
    noise_gen = NoiseGenerator(cfg.noise_type)
    criterion = DenoisingLoss(cfg.l1_weight, cfg.l2_weight, cfg.ssim_weight)
    img_hw = (cfg.img_size, cfg.img_size)

    if params is None:
        dummy = jnp.zeros((1, *img_hw, 3), jnp.float32)
        params = model.init(jax.random.PRNGKey(cfg.seed), dummy, dummy, img_hw)[
            "params"
        ]
    tx = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
    opt_state = tx.init(params)

    os.makedirs(cfg.log_dir, exist_ok=True)
    t0 = time.time()

    if device_stack is not None:
        if batch_size is None:
            raise ValueError("device_stack requires batch_size")
        if device_stack.shape[1:3] != img_hw:
            raise ValueError(
                f"device_stack spatial {device_stack.shape[1:3]} != {img_hw}")
        chunk_fn = _make_chunk(
            model, tx, criterion, noise_gen, cfg.noise_params, img_hw,
            cfg.use_bf16)
        n = device_stack.shape[0]
        rng_np = np.random.RandomState(cfg.seed)

        def idx_stream():
            order = np.arange(n)
            while True:
                if batch_size > n:
                    yield rng_np.randint(0, n, size=batch_size)
                    continue
                rng_np.shuffle(order)
                for i in range(0, n - batch_size + 1, batch_size):
                    yield order[i:i + batch_size]

        stream = idx_stream()
        root = jax.random.PRNGKey(cfg.seed)
        done = 0
        with open(os.path.join(cfg.log_dir, "metrics.jsonl"), "a") as mf:
            while done < cfg.train_steps:
                k = min(max(cfg.log_every, 1), cfg.train_steps - done)
                idx = np.stack([next(stream) for _ in range(k)])
                params, opt_state, losses = chunk_fn(
                    params, opt_state, device_stack,
                    jnp.asarray(idx, jnp.int32),
                    jax.random.fold_in(root, done))
                done += k
                rec = {"step": done - 1, "loss": float(losses[-1]),
                       "elapsed_s": round(time.time() - t0, 1)}
                mf.write(json.dumps(rec) + "\n")
                mf.flush()
                print(f"step {done}/{cfg.train_steps} loss {rec['loss']:.5f}",
                      flush=True)
        return params

    step_fn = _make_step(
        model, tx, criterion, noise_gen, cfg.noise_params, img_hw, cfg.use_bf16
    )
    rng = jax.random.PRNGKey(cfg.seed)
    with open(os.path.join(cfg.log_dir, "metrics.jsonl"), "a") as mf:
        for step in range(cfg.train_steps):
            clean = jnp.asarray(next(data_iter), jnp.float32)
            if clean.shape[1:3] != img_hw:
                clean = resize_bilinear(clean, img_hw)
            rng, sub = jax.random.split(rng)
            params, opt_state, loss = step_fn(params, opt_state, clean, sub)
            if step % cfg.log_every == 0:
                rec = {"step": step, "loss": float(loss),
                       "elapsed_s": round(time.time() - t0, 1)}
                mf.write(json.dumps(rec) + "\n")
                mf.flush()
                print(f"step {step}/{cfg.train_steps} loss {rec['loss']:.5f}")
    return params


def validate_denoiser(model, params, data_iter, cfg: DenoiseConfig,
                      viz_path: Optional[str] = None):
    """PSNR/SSIM over val batches (denoising.py:268-312). With `viz_path`,
    writes a [noisy | denoised | clean] panel PNG for the first val image —
    the reference's TensorBoard image logging (denoising.py:218-222)."""
    noise_gen = NoiseGenerator(cfg.noise_type)
    img_hw = (cfg.img_size, cfg.img_size)

    @jax.jit
    def infer(params, clean, rng):
        noisy = noise_gen(rng, clean, cfg.noise_params)
        noisy_norm = (noisy - _IMAGENET_MEAN) / _IMAGENET_STD
        pred = jnp.clip(model.apply({"params": params}, noisy_norm, noisy, img_hw), 0, 1)
        return psnr(pred, clean), ssim(pred, clean), noisy, pred

    rng = jax.random.PRNGKey(cfg.seed + 1)
    psnrs, ssims = [], []
    for step, batch in enumerate(data_iter):
        if step >= cfg.val_steps:
            break
        clean = jnp.asarray(batch, jnp.float32)
        if clean.shape[1:3] != img_hw:
            clean = resize_bilinear(clean, img_hw)
        rng, sub = jax.random.split(rng)
        p, s, noisy, pred = infer(params, clean, sub)
        if viz_path is not None and step == 0:
            try:
                from PIL import Image

                panel = np.concatenate(
                    [np.asarray(t[0], np.float32)
                     for t in (noisy, pred, clean)], axis=1,
                )
                Image.fromarray(
                    (np.clip(panel, 0, 1) * 255).astype(np.uint8)
                ).save(viz_path)
            except Exception as e:  # viz must never kill a run
                print(f"denoise viz panel failed: {e}")
        psnrs.append(float(p))
        ssims.append(float(s))
    return {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims))}
