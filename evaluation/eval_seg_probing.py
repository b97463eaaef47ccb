"""Linear-probe segmentation evaluation CLI (reference
evaluation/eval_seg_probing.py).

Usage:
    python evaluation/eval_seg_probing.py dataset=ade20k dataroot=/data \\
        model=naf [key=value ...]
    python evaluation/eval_seg_probing.py synthetic=true num_epochs=1  # smoke

Trains a 1x1 classifier over frozen backbone + upsampler features, reports
pixel accuracy and mIoU.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

import jax
import jax.numpy as jnp
import numpy as np

from naf_tpu.backbones import PretrainedViTWrapper
from naf_tpu.config import instantiate, load_config
from naf_tpu.evals.seg_probing import LinearProbe, ProbeConfig


def build_feature_fn(cfg, backbone, model, model_params):
    mean_b = jnp.asarray(backbone.config["mean"], jnp.float32)
    std_b = jnp.asarray(backbone.config["std"], jnp.float32)
    mean_u = jnp.asarray((0.485, 0.456, 0.406), jnp.float32)
    std_u = jnp.asarray((0.229, 0.224, 0.225), jnp.float32)

    def feature_fn(image01, target_hw):
        lr = backbone((image01 - mean_b) / std_b)
        return model.apply(
            {"params": model_params}, (image01 - mean_u) / std_u, lr,
            tuple(int(v) for v in target_hw),
        )

    return feature_fn


def synthetic_loader(n, batch, size, n_cls, seed=0):
    rng = np.random.RandomState(seed)
    for _ in range(n):
        img = rng.rand(batch, size, size, 3).astype(np.float32)
        lbl = rng.randint(0, n_cls, (batch, size, size)).astype(np.int32)
        yield img, lbl


def dataset_loader(cfg, split):
    from naf_tpu.data import DataLoader
    from naf_tpu.data.transforms import image_transform, label_transform

    ds = instantiate(
        cfg["dataset"],
        split=split,
        transform=lambda im: image_transform(im, cfg["img_size"]),
        target_transform=lambda lb: label_transform(lb, cfg["target_size"]),
    )
    dl_cfg = cfg["train_dataloader" if split == "train" else "val_dataloader"]
    loader = DataLoader(
        ds, dl_cfg["batch_size"], shuffle=(split == "train"),
        num_workers=dl_cfg.get("num_workers", 4), drop_last=(split == "train"),
    )
    for batch in loader:
        yield batch["image"], batch["label"]


def main(argv, model_params=None):
    """`model_params`: optionally inject trained flax params directly (the
    self-distillation quality loop, tools/train_distilled_eval.py); else
    params come from eval.model_ckpt (torch format) or random init."""
    overrides = [a for a in argv if "=" in a]
    cfg = load_config("eval_probing", overrides)
    synthetic = bool(cfg.get("synthetic", False))
    n_cls = 7 if synthetic else cfg["metrics"]["seg"]["num_classes"]

    backbone = PretrainedViTWrapper(
        cfg["backbone"]["name"], checkpoint=cfg["backbone"].get("checkpoint")
    )
    model = instantiate(cfg["model"])
    # upsampler params: injected, converted checkpoint, or random init
    size = cfg["img_size"]
    if model_params is None:
        dummy_img = jnp.zeros((1, size, size, 3), jnp.float32)
        gh = size // backbone.patch_size
        dummy_feat = jnp.zeros((1, gh, gh, backbone.embed_dim), jnp.float32)
        variables = model.init(
            jax.random.PRNGKey(0), dummy_img, dummy_feat, (size, size)
        )
        model_params = variables.get("params", {})
    if cfg["eval"].get("model_ckpt"):
        from naf_tpu.convert import naf_params_from_torch

        model_params = jax.tree.map(
            jnp.asarray, naf_params_from_torch(cfg["eval"]["model_ckpt"])
        )

    feature_fn = build_feature_fn(cfg, backbone, model, model_params)
    steps = 10 if synthetic else 1000
    probe = LinearProbe(
        feature_fn, backbone.embed_dim,
        ProbeConfig(num_classes=n_cls, num_epochs=cfg["num_epochs"],
                    lr=cfg["optimizer"]["lr"], steps_per_epoch=steps),
    )

    host_rng = np.random.RandomState(0)
    epochs = 1 if cfg.get("sanity") else cfg["num_epochs"]
    for epoch in range(epochs):
        if synthetic:
            train = synthetic_loader(steps, 2, size, n_cls, seed=epoch)
        else:
            train = dataset_loader(cfg, "train")
        loss = probe.train_epoch(train, host_rng)
        print(f"epoch {epoch}: loss {loss:.4f}")

    val = (
        synthetic_loader(5, 2, size, n_cls, seed=123)
        if synthetic
        else dataset_loader(cfg, "val")
    )
    metrics = probe.evaluate(val)
    print(json.dumps(metrics))
    return metrics


if __name__ == "__main__":
    main(sys.argv[1:])
