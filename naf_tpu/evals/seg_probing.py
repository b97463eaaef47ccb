"""Linear-probe semantic segmentation evaluation (reference
evaluation/eval_seg_probing.py).

A 1x1-conv classifier is trained over frozen backbone + upsampler features
with cross entropy (ignore index 255); quality is reported as pixel accuracy
and mean IoU. Metrics are computed from a streaming confusion matrix
(equivalent to torchmetrics' multiclass Accuracy / JaccardIndex with
micro-average over valid pixels, eval_seg_probing.py:54-55,221-257).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from naf_tpu.ops.resize import resize_bilinear

IGNORE = 255

__all__ = ["SegMetrics", "LinearProbe", "ProbeConfig"]


class SegMetrics:
    """Streaming confusion matrix -> accuracy + mIoU."""

    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self.reset()

    def reset(self):
        self.confusion = np.zeros((self.num_classes, self.num_classes), np.int64)

    def update(self, pred: np.ndarray, target: np.ndarray):
        """pred/target: int arrays of equal shape, IGNORE already removed."""
        n = self.num_classes
        idx = target.astype(np.int64) * n + pred.astype(np.int64)
        self.confusion += np.bincount(idx, minlength=n * n).reshape(n, n)

    def compute(self) -> dict:
        c = self.confusion.astype(np.float64)
        total = c.sum()
        acc = np.diag(c).sum() / max(total, 1)
        inter = np.diag(c)
        union = c.sum(0) + c.sum(1) - inter
        # torchmetrics JaccardIndex (macro): mean over classes present
        valid = union > 0
        iou = np.where(valid, inter / np.maximum(union, 1), np.nan)
        miou = np.nanmean(iou) if valid.any() else 0.0
        return {"accuracy": float(acc), "iou": float(miou)}


@dataclasses.dataclass
class ProbeConfig:
    num_classes: int = 151
    num_epochs: int = 20  # config/eval_probing.yaml
    lr: float = 1e-3
    steps_per_epoch: int = 1000  # for the cosine schedule horizon
    hflip_prob: float = 0.5  # eval_seg_probing.py:178-181
    seed: int = 0


class LinearProbe:
    """Trains/evaluates the 1x1 classifier over frozen features.

    `feature_fn(image_01_nhwc, target_hw) -> (B, H, W, C)` wraps the frozen
    backbone + upsampler (normalization inside, eval_seg_probing.py:94-110).
    """

    def __init__(self, feature_fn: Callable, embed_dim: int, cfg: ProbeConfig):
        self.feature_fn = feature_fn
        self.cfg = cfg
        rng = jax.random.PRNGKey(cfg.seed)
        scale = 1.0 / np.sqrt(embed_dim)
        self.params = {
            "kernel": jax.random.uniform(
                rng, (embed_dim, cfg.num_classes), jnp.float32, -scale, scale
            ),
            "bias": jnp.zeros((cfg.num_classes,), jnp.float32),
        }
        schedule = optax.cosine_decay_schedule(
            cfg.lr, cfg.num_epochs * cfg.steps_per_epoch
        )
        self.tx = optax.adamw(schedule)
        self.opt_state = self.tx.init(self.params)
        self._step = self._make_step()
        self._logits = jax.jit(self._apply)

    @staticmethod
    def _apply(params, feats):
        return feats.astype(jnp.float32) @ params["kernel"] + params["bias"]

    def _make_step(self):
        def loss_fn(params, feats, target):
            logits = self._apply(params, feats)  # (B, H, W, K)
            logits = logits.reshape(-1, logits.shape[-1])
            labels = target.reshape(-1)
            valid = labels != IGNORE
            labels = jnp.where(valid, labels, 0)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
            return jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1)

        def step(params, opt_state, feats, target):
            loss, grads = jax.value_and_grad(loss_fn)(params, feats, target)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return jax.jit(step)

    def _features(self, image, target_hw):
        feats = self.feature_fn(image, target_hw)
        if feats.shape[1:3] != tuple(target_hw):
            # classifier then bilinear resize in the reference; applying the
            # (linear) classifier after resize is equivalent and cheaper
            feats = resize_bilinear(feats, target_hw)
        return jax.lax.stop_gradient(feats)

    def train_epoch(self, loader: Iterator, rng: np.random.RandomState):
        losses = []
        for image, target in loader:
            if rng.rand() < self.cfg.hflip_prob:
                image = image[:, :, ::-1]
                target = target[:, :, ::-1]
            feats = self._features(jnp.asarray(image), target.shape[-2:])
            self.params, self.opt_state, loss = self._step(
                self.params, self.opt_state, feats, jnp.asarray(target)
            )
            losses.append(float(loss))
        return float(np.mean(losses)) if losses else 0.0

    def evaluate(self, loader: Iterator) -> dict:
        metrics = SegMetrics(self.cfg.num_classes)
        for image, target in loader:
            feats = self._features(jnp.asarray(image), target.shape[-2:])
            logits = self._logits(self.params, feats)
            pred = np.asarray(jnp.argmax(logits, axis=-1))
            target = np.asarray(target)
            valid = target != IGNORE
            metrics.update(pred[valid], target[valid])
        return metrics.compute()
