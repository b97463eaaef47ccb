"""Self-distillation quality loop on the real shard: train NAF, then show
the trained model beating Bilinear on the seg probe.

Protocol (reference train.py self-distillation + evaluation/eval_seg_probing
setup, run end-to-end on TPU):

1. Frozen backbone = the SAME random-init vit_small_patch16_224 the committed
   seg-probe eval uses (benchmarks/real_eval.json; no pretrained weights
   reachable offline).
2. Self-distill NAF on the shard's real training photographs (reference
   compute_feats: HR backbone features are the target, the model upsamples
   the downsampled image's features guided by the HR image).
3. Re-run the EXACT committed probe protocol (evaluation/eval_real_shard.py
   run_seg arguments) with the trained params and append
   `seg_probing_naf_distilled` to benchmarks/real_eval.json.

Success criterion (VERDICT r3 item 3): trained NAF IoU > Bilinear IoU
(0.298), where random-init NAF scored 0.287.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "evaluation"))

SHARD = os.path.join(REPO, "benchmarks", "real_shard")
OUT = os.path.join(REPO, "benchmarks", "real_eval.json")

PROBE_ARGS = [  # identical to evaluation/eval_real_shard.py::run_seg
    "model=naf",
    "dataset=ade20k",
    f"dataset.root={os.path.join(SHARD, 'ade20k')}",
    "dataset.num_classes=7",
    "img_size=256",
    "num_epochs=8",
    "train_dataloader.batch_size=2",
    "val_dataloader.batch_size=1",
    "backbone.name=vit_small_patch16_224",
]


def main(argv=()):
    import jax.numpy as jnp
    import numpy as np

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/naf_tpu_jax_cache")

    from naf_tpu.backbones import PretrainedViTWrapper
    from naf_tpu.data import ImageFolderDataset
    from naf_tpu.data.transforms import image_transform
    from naf_tpu.models.naf import NAF
    from naf_tpu.train.trainer import TrainConfig, train_upsampler

    from naf_tpu.data.device_cache import device_cached_stack

    steps = int(argv[0]) if argv else 25_000  # reference budget
    run_davis = "--no-davis" not in argv
    img_size = 256

    # 1. the probe's backbone (random init, seed 0 — identical construction)
    backbone = PretrainedViTWrapper("vit_small_patch16_224")
    model = NAF()

    # 2. real-photograph training crops (60 after --extend-train), resident
    # on device once; training runs log_every steps per dispatch via
    # lax.scan (train_upsampler device_stack path) — per-step dispatch
    # costs ~0.5 s through the tunnel, so the reference's 25k-step budget
    # (config/base.yaml:11-12) needs chunked dispatch.
    ds = ImageFolderDataset(
        os.path.join(SHARD, "ade20k", "images", "training"),
        transform=lambda im: image_transform(im, img_size),
    )
    stack = device_cached_stack(ds)
    print(f"device stack: {stack.shape}", flush=True)

    cfg = TrainConfig(
        train_steps=steps,
        img_size=img_size,
        batch_size=4,
        down_factor="random",
        log_dir=os.path.join(REPO, "runs", "distill_naf"),
        log_every=100,
    )
    params = train_upsampler(model, backbone, None, cfg, device_stack=stack)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)

    # 3. the committed probe protocol, trained params injected
    import eval_seg_probing

    print("== seg probing: distilled naf ==", flush=True)
    metrics = eval_seg_probing.main(PROBE_ARGS, model_params=params)
    metrics["train_steps"] = steps

    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)
    results["seg_probing_naf_distilled"] = metrics
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(metrics, indent=2))
    base = results.get("seg_probing_bilinear", {}).get("iou")
    if base is not None:
        print(f"bilinear IoU {base:.4f} -> distilled NAF IoU "
              f"{metrics['iou']:.4f} ({'BEATS' if metrics['iou'] > base else 'below'})")

    # 4. DAVIS propagation with the distilled weights (committed protocol,
    # eval_real_shard.py::run_video arguments)
    if run_davis:
        import eval_video_seg

        print("== DAVIS propagation: distilled naf ==", flush=True)
        jf = eval_video_seg.main(
            [
                "model=naf",
                f"dataroot={SHARD}",
                f"dataset.root={os.path.join(SHARD, 'davis')}",
                "eval.ups_factor=2",
                "backbone.name=vit_small_patch16_224",
                "run_dir=/tmp/naf_real_shard_runs_distilled",
            ],
            model_params=params,
        )
        jf["train_steps"] = steps
        with open(OUT) as f:
            results = json.load(f)
        results["davis_jf_naf_distilled"] = jf
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)
        print(json.dumps(jf, indent=2))


if __name__ == "__main__":
    main(sys.argv[1:])
