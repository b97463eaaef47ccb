"""NAF upsampler training CLI (reference train.py).

Usage:
    python train.py [key=value ...]
e.g.
    python train.py model=naf backbone.name=vit_small_patch14_dinov2 \\
        dataroot=/data train_steps=25000
    python train.py synthetic=true train_steps=20 img_size=224   # smoke run

Config groups and override syntax mirror the reference Hydra setup
(config/base.yaml); `synthetic=true` replaces the ImageNet folder with random
images for dataset-free smoke runs.
"""

import sys

import numpy as np

from naf_tpu.backbones import load_multiple_backbones
from naf_tpu.config import instantiate, load_config
from naf_tpu.train.trainer import TrainConfig, train_upsampler


def synthetic_images(batch_size, img_size, seed=0):
    rng = np.random.RandomState(seed)
    while True:
        yield rng.rand(batch_size, img_size, img_size, 3).astype(np.float32)


def folder_images(cfg):
    from naf_tpu.data import DataLoader, ImageFolderDataset
    from naf_tpu.data.transforms import image_transform

    ds = ImageFolderDataset(
        cfg["dataset"]["root"],
        transform=lambda im: image_transform(im, cfg["img_size"]),
    )
    loader = DataLoader(
        ds,
        batch_size=cfg["train_dataloader"]["batch_size"],
        shuffle=cfg["train_dataloader"].get("shuffle", True),
        num_workers=cfg["train_dataloader"].get("num_workers", 4),
        drop_last=True,
    )
    while True:
        for batch in loader:
            yield batch["image"]


def main(argv):
    overrides = [a for a in argv if "=" in a]
    cfg = load_config("base", overrides)
    synthetic = bool(cfg.get("synthetic", False))

    import jax.numpy as jnp

    # reference loads a list and trains on the first (utils/training.py:
    # 193-231); extra backbones stay available for side-by-side logging.
    backbones = load_multiple_backbones(
        cfg["backbone"],
        dtype=jnp.bfloat16 if cfg.get("use_bf16", True) else jnp.float32,
    )
    backbone = backbones[0]
    model = instantiate(cfg["model"])

    tcfg = TrainConfig(
        train_steps=cfg["train_steps"],
        img_size=cfg["img_size"],
        lr=cfg["optimizer"]["lr"],
        weight_decay=cfg["optimizer"].get("weight_decay", 1e-5),
        batch_size=cfg["train_dataloader"]["batch_size"],
        down_factor=cfg.get("down_factor", "fixed"),
        use_bf16=cfg.get("use_bf16", True),
        use_checkpointing=cfg.get("use_checkpointing", False),
        log_dir=cfg.get("run_dir", "runs/naf"),
    )
    if cfg.get("sanity"):
        tcfg.train_steps = 1

    params = None
    if cfg.get("model_ckpt"):  # resume / finetune (reference train.py:71-73)
        ckpt = cfg["model_ckpt"]
        if ckpt.endswith(".pth"):
            import jax
            from naf_tpu.convert import naf_params_from_torch

            params = jax.tree.map(jnp.asarray, naf_params_from_torch(ckpt))
        else:
            from naf_tpu.train.trainer import load_checkpoint

            params = load_checkpoint(ckpt, None)["params"]
        print(f"loaded model checkpoint from {ckpt}")

    data = (
        synthetic_images(tcfg.batch_size, tcfg.img_size)
        if synthetic
        else folder_images(cfg)
    )
    mesh = build_mesh(cfg.get("mesh", "auto"), tcfg.batch_size)
    params = train_upsampler(model, backbone, data, tcfg, params=params,
                             mesh=mesh)
    print(f"done; checkpoints + metrics in {tcfg.log_dir}")
    return params


def build_mesh(mesh_cfg, batch_size):
    """CLI data-parallel mesh selection.

    mesh=auto (default): data-parallel over all devices when >1 device is
    visible and the batch divides evenly; mesh=data: force DP over all
    devices; mesh=none: single-device (the reference's semantics,
    train.py:55,68 hard-codes one GPU). Batches are sharded along the data
    axis by train_upsampler; params/opt state replicate.
    """
    if mesh_cfg in (None, False, "none", "off"):
        return None
    import jax

    n = len(jax.devices())
    if n <= 1:
        return None
    if batch_size % n:
        if mesh_cfg == "data":
            raise ValueError(
                f"mesh=data needs batch_size % n_devices == 0 "
                f"(batch {batch_size}, devices {n})"
            )
        return None  # auto: fall back to single-device
    from naf_tpu.parallel import make_mesh

    mesh = make_mesh(data=n, space=1)
    print(f"data-parallel mesh over {n} devices")
    return mesh


if __name__ == "__main__":
    main(sys.argv[1:])
