"""Denoising PSNR benchmark on real photographs (reference ablation parity).

Reproduces the reference's committed denoising ablation protocol
(/root/reference/denoising.py:427-451): gaussian sigma=0.5, 4000 train steps,
448^2 crops, then PSNR on held-out images with fresh noise. The reference's
A100 numbers (ImageNet data): NAF 24.19 dB (ks15, dim256, enc2, heads 1-1,
bs8), REDNet 23.60, IRCNN 22.44.

Data here is the committed real-photograph shard (no egress in this
environment): 18 training / 9 validation images. Small-data PSNR is not
directly comparable to ImageNet-trained numbers; the artifact demonstrates
the full train->validate pipeline on real pixels on TPU.

Writes benchmarks/denoising.json.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

MODELS = {
    "naf": [
        "model=naf", "model.kernel_size=15", "model.heads_attn=1",
        "model.heads_rope=1",
    ],
    "rednet": ["model=rednet"],
    "ircnn": ["model=ircnn"],
}

COMMON = [
    "denoising.noise_params.std=0.5",
    "train_steps=4000",
    "val_steps=54",  # 54 x bs2 = 108 noisy views of the 9 held-out images
    "train_dataloader.batch_size=8",
    "dataset.root=benchmarks/real_shard/ade20k/images/training",
    "dataset.val_root=benchmarks/real_shard/ade20k/images/validation",
]

REFERENCE_A100 = {"naf": 24.19, "rednet": 23.60, "ircnn": 22.44,
                  "dncnn": 20.86}


def main():
    from denoising import main as denoise_main

    which = sys.argv[1:] or list(MODELS)
    out_path = "benchmarks/denoising.json"
    try:
        results = json.load(open(out_path))
    except (FileNotFoundError, json.JSONDecodeError):
        results = {
            "_protocol": "gaussian sigma=0.5, 4000 steps @448^2, PSNR on "
                         "held-out real photos with fresh noise "
                         "(reference denoising.py:427-451 protocol)",
            "_data": "benchmarks/real_shard (18 train / 9 val real photos; "
                     "reference trained on ImageNet - absolute PSNR not "
                     "directly comparable)",
            "_reference_a100_imagenet_psnr": REFERENCE_A100,
            "models": {},
        }
    for name in which:
        overrides = MODELS[name] + COMMON + [f"run_dir=runs/denoise_{name}"]
        print(f"=== training {name} ===", flush=True)
        t0 = time.time()
        metrics = denoise_main(overrides)
        metrics["train_s"] = round(time.time() - t0, 1)
        metrics["overrides"] = overrides
        results["models"][name] = metrics
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
        print(f"{name}: {metrics}", flush=True)


if __name__ == "__main__":
    main()
