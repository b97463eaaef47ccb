"""DAVIS video label propagation CLI (reference evaluation/eval_video_seg.py).

Usage:
    python evaluation/eval_video_seg.py dataroot=/data model=naf \\
        eval.ups_factor=2 [key=value ...]

Per video: propagate the first-frame annotation with NAF-upsampled features,
write indexed PNGs, then run the J&F evaluation and export JSON.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import glob
import json

import jax
import jax.numpy as jnp

from naf_tpu.backbones import PretrainedViTWrapper
from naf_tpu.config import instantiate, load_config
from naf_tpu.evals.video_seg_runner import evaluate_davis_results, run_video


def main(argv, model_params=None):
    overrides = [a for a in argv if "=" in a]
    cfg = load_config("eval_video_seg", overrides)
    davis_root = cfg["dataset"]["root"]

    backbone = PretrainedViTWrapper(
        cfg["backbone"]["name"], checkpoint=cfg["backbone"].get("checkpoint")
    )
    model = instantiate(cfg["model"])
    gh = 224 // backbone.patch_size
    dummy_img = jnp.zeros((1, 224, 224, 3), jnp.float32)
    dummy_feat = jnp.zeros((1, gh, gh, backbone.embed_dim), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy_img, dummy_feat, (224, 224))
    params = variables.get("params", {})
    if model_params is not None:  # trained-weight injection (distill eval)
        params = model_params
    elif cfg["eval"].get("model_ckpt"):
        from naf_tpu.convert import naf_params_from_torch

        params = jax.tree.map(
            jnp.asarray, naf_params_from_torch(cfg["eval"]["model_ckpt"])
        )

    def upsampler_fn(img, feats, hw):
        return model.apply({"params": params}, img, feats, tuple(hw))

    subset = cfg["dataset"].get("split", "val")
    with open(os.path.join(davis_root, "ImageSets", "2017", f"{subset}.txt")) as f:
        videos = [l.strip() for l in f if l.strip()]

    out_root = os.path.join(
        cfg.get("run_dir", "runs/video_seg"),
        f"davis_vidseg_{cfg['eval']['ups_factor']}_{cfg['model'].get('name', 'model')}",
    )
    for video in videos:
        frames = sorted(
            glob.glob(os.path.join(davis_root, "JPEGImages", "480p", video, "*.jpg"))
        )
        first_mask = os.path.join(
            davis_root, "Annotations", "480p", video, "00000.png"
        )
        print(f"propagating {video} ({len(frames)} frames)")
        from PIL import Image

        palette = Image.open(first_mask).getpalette()
        palette = bytes(palette) if palette else None
        run_video(
            backbone,
            upsampler_fn,
            frames,
            first_mask,
            os.path.join(out_root, video),
            ups_factor=cfg["eval"]["ups_factor"],
            n_last_frames=cfg["eval"]["n_last_frames"],
            size_mask=cfg["eval"]["size_mask_neighborhood"],
            topk=cfg["eval"]["topk"],
            palette=palette,
        )
        if cfg.get("sanity"):
            break

    summary, per_seq = evaluate_davis_results(davis_root, out_root, subset)
    print(json.dumps(summary, indent=2))
    with open(os.path.join(out_root, "results.json"), "w") as f:
        json.dump({"summary": summary, "per_sequence": per_seq}, f, indent=2)
    return summary


if __name__ == "__main__":
    main(sys.argv[1:])
