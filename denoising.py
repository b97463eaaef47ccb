"""Denoising/restoration training CLI (reference denoising.py).

Usage:
    python denoising.py model=naf denoising.noise_type=gaussian [key=value ...]
    python denoising.py synthetic=true train_steps=20 img_size=64  # smoke run

NAF doubles as a restoration model here: the noisy image itself is passed as
the "features" input (reference denoising.py:212-213).
"""

import sys

import numpy as np

from naf_tpu.config import instantiate, load_config
from naf_tpu.train.denoise import DenoiseConfig, train_denoiser, validate_denoiser


def synthetic_images(batch_size, img_size, seed=0):
    rng = np.random.RandomState(seed)
    while True:
        yield rng.rand(batch_size, img_size, img_size, 3).astype(np.float32)


def main(argv):
    overrides = [a for a in argv if "=" in a]
    cfg = load_config("base_denoising", overrides)
    synthetic = bool(cfg.get("synthetic", False))

    model = instantiate(cfg["model"])
    den = cfg["denoising"]
    dcfg = DenoiseConfig(
        train_steps=cfg["train_steps"],
        val_steps=cfg.get("val_steps", 100),
        img_size=cfg["img_size"],
        lr=cfg["optimizer"]["lr"],
        weight_decay=cfg["optimizer"].get("weight_decay", 1e-5),
        noise_type=den["noise_type"],
        noise_params=den.get("noise_params"),
        l1_weight=den["loss"]["l1_weight"],
        l2_weight=den["loss"]["l2_weight"],
        ssim_weight=den["loss"]["ssim_weight"],
        use_bf16=cfg.get("use_bf16", True),
        log_dir=cfg.get("run_dir", "runs/denoise"),
    )
    if cfg.get("sanity"):
        dcfg.train_steps = 1
        dcfg.val_steps = 1

    device_stack = None
    if synthetic:
        train_iter = synthetic_images(cfg["train_dataloader"]["batch_size"],
                                      dcfg.img_size)
        val_iter = synthetic_images(cfg["val_dataloader"]["batch_size"],
                                    dcfg.img_size, seed=1)
    else:
        from naf_tpu.data import (DataLoader, ImageFolderDataset,
                                  device_cached_batches)
        from naf_tpu.data.transforms import image_transform

        ds = ImageFolderDataset(
            cfg["dataset"]["root"],
            transform=lambda im: image_transform(im, dcfg.img_size),
        )
        # Optional held-out validation folder (dataset.val_root); defaults to
        # the training folder like the reference (denoising.py:350-355 uses
        # get_dataloaders' val split of the same dataset).
        val_root = cfg["dataset"].get("val_root")
        val_ds = ImageFolderDataset(
            val_root, transform=lambda im: image_transform(im, dcfg.img_size)
        ) if val_root else ds

        # Small corpora: keep the transformed stack resident in HBM, gather
        # batches on device, and scan log_every train steps per dispatch
        # (per-step host traffic + dispatch would otherwise dominate
        # through the host<->device tunnel). Train and val caches are gated
        # INDEPENDENTLY on their own corpus sizes — a large --val-root must
        # not be uploaded wholesale to HBM (one OOM poisons the process).
        cache_max = cfg.get("device_cache_max_images", 512)

        def forever(loader):
            while True:
                for b in loader:
                    yield b["image"]

        if len(ds) <= cache_max:
            from naf_tpu.data import device_cached_stack

            device_stack = device_cached_stack(ds)
            train_iter = None
        else:
            train_iter = forever(DataLoader(
                ds, cfg["train_dataloader"]["batch_size"], shuffle=True,
                num_workers=cfg["train_dataloader"].get("num_workers", 4),
                drop_last=True,
            ))
        if len(val_ds) <= cache_max:
            val_iter = device_cached_batches(
                val_ds, cfg["val_dataloader"]["batch_size"], shuffle=False)
        else:
            val_iter = forever(DataLoader(
                val_ds, cfg["val_dataloader"]["batch_size"], shuffle=False,
                num_workers=2, drop_last=True,
            ))

    params = train_denoiser(
        model, train_iter, dcfg,
        device_stack=device_stack,
        batch_size=cfg["train_dataloader"]["batch_size"],
    )
    import os

    metrics = validate_denoiser(
        model, params, val_iter, dcfg,
        viz_path=os.path.join(dcfg.log_dir, "val_panel.png"),
    )
    print(f"validation: PSNR {metrics['psnr']:.2f} dB, SSIM {metrics['ssim']:.4f}")
    return metrics


if __name__ == "__main__":
    main(sys.argv[1:])
