"""End-to-end DAVIS video segmentation driver (reference
evaluation/eval_video_seg.py:357-806): per-video feature extraction +
label propagation + indexed-PNG export + J&F evaluation over the results.
"""

from __future__ import annotations

import os
from collections import deque
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np
from PIL import Image

from naf_tpu.evals.video_seg import (
    davis_eval_boundary,
    davis_eval_iou,
    davis_statistics,
    label_propagation,
    norm_mask,
)
from naf_tpu.ops.resize import resize_bicubic, resize_bilinear, resize_nearest_exact

__all__ = ["extract_feature", "run_video", "evaluate_davis_results"]


def _read_frame(path: str, patch_size: int):
    """Image -> (1, H', W', 3) float [0,1], H'/W' rounded down to patch
    multiples (eval_video_seg.py:564-581)."""
    img = Image.open(path).convert("RGB")
    arr = np.asarray(img, np.float32) / 255.0
    h, w = arr.shape[:2]
    arr = jnp.asarray(arr)[None]
    th, tw = h // patch_size * patch_size, w // patch_size * patch_size
    if (th, tw) != (h, w):
        arr = resize_bilinear(arr, (th, tw))
    return arr, h, w


def extract_feature(backbone, upsampler_fn, frame, ups_factor: int):
    """(1, H, W, 3) [0,1] frame -> (1, h*f, w*f, C) upsampled features
    (eval_video_seg.py:564-598)."""
    mean_b = jnp.asarray(backbone.config["mean"], jnp.float32)
    std_b = jnp.asarray(backbone.config["std"], jnp.float32)
    lr_feats = backbone((frame - mean_b) / std_b)
    hr_hw = (lr_feats.shape[1] * ups_factor, lr_feats.shape[2] * ups_factor)
    mean_u = jnp.asarray((0.485, 0.456, 0.406), jnp.float32)
    std_u = jnp.asarray((0.229, 0.224, 0.225), jnp.float32)
    img_ups = resize_bicubic((frame - mean_u) / std_u, hr_hw)
    return upsampler_fn(img_ups, lr_feats, hr_hw)


def _first_seg(mask_path: str, h: int, w: int):
    """First-frame annotation -> one-hot (1, K, h, w) at the feature grid
    plus the original indexed mask."""
    seg = np.asarray(Image.open(mask_path))
    n_obj = int(seg.max()) + 1
    onehot = np.stack([(seg == i).astype(np.float32) for i in range(n_obj)])
    small = resize_nearest_exact(
        jnp.asarray(onehot.transpose(1, 2, 0))[None], (h, w)
    )[0]
    return jnp.transpose(small, (2, 0, 1))[None], seg


def run_video(
    backbone,
    upsampler_fn: Callable,
    frame_paths,
    first_mask_path: str,
    out_dir: str,
    ups_factor: int = 1,
    n_last_frames: int = 7,
    size_mask: int = 12,
    topk: int = 5,
    palette: Optional[bytes] = None,
):
    """Propagate the first-frame annotation through a video; writes indexed
    PNGs compatible with the DAVIS evaluator (eval_video_seg.py:357-459)."""
    os.makedirs(out_dir, exist_ok=True)
    ps = backbone.config["ps"]

    frame1, ori_h, ori_w = _read_frame(frame_paths[0], ps)
    feat1 = extract_feature(backbone, upsampler_fn, frame1, ups_factor)
    fh, fw = feat1.shape[1], feat1.shape[2]
    first_seg, seg_ori = _first_seg(first_mask_path, fh, fw)
    feat1_flat = feat1[0].reshape(fh * fw, -1).T  # (C, h*w)

    def save_indexed(path, mask_np):
        img = Image.fromarray(mask_np.astype(np.uint8), mode="P")
        if palette is not None:
            img.putpalette(palette)
        img.save(path)

    save_indexed(os.path.join(out_dir, "00000.png"), seg_ori)

    ctx = deque(maxlen=n_last_frames)  # (feat (C, hw), seg (1, K, h, w))
    for cnt in range(1, len(frame_paths)):
        frame, _, _ = _read_frame(frame_paths[cnt], ps)
        feat_tar = extract_feature(backbone, upsampler_fn, frame, ups_factor)
        feat_tar_flat = feat_tar[0].reshape(fh * fw, -1)  # (hw, C)

        feats = jnp.stack([feat1_flat] + [f for f, _ in ctx])  # (n, C, hw)
        segs = jnp.concatenate([first_seg] + [s for _, s in ctx])  # (n, K, h, w)
        seg_tar = label_propagation(
            feat_tar_flat, feats, segs.reshape(segs.shape[0], segs.shape[1], -1),
            fh, fw, size_mask=size_mask, topk=topk,
        )  # (K, h, w)

        ctx.append((feat_tar_flat.T, seg_tar[None]))

        up_hw = (seg_tar.shape[1] * ps // ups_factor, seg_tar.shape[2] * ps // ups_factor)
        up = resize_bilinear(
            jnp.transpose(seg_tar, (1, 2, 0))[None], up_hw
        )[0]
        up = norm_mask(jnp.transpose(up, (2, 0, 1)))
        pred = np.asarray(jnp.argmax(up, axis=0), np.uint8)
        pred = np.asarray(Image.fromarray(pred).resize((ori_w, ori_h), Image.NEAREST))
        name = os.path.basename(frame_paths[cnt]).replace(".jpg", ".png")
        save_indexed(os.path.join(out_dir, name), pred)


def evaluate_davis_results(davis_root: str, results_dir: str, subset: str = "val"):
    """J&F over saved result PNGs (eval_video_seg.py:688-757)."""
    with open(os.path.join(davis_root, "ImageSets", "2017", f"{subset}.txt")) as f:
        sequences = [l.strip() for l in f if l.strip()]

    metrics = {m: {"M": [], "R": [], "D": []} for m in ("J", "F")}
    per_seq = {}
    for seq in sequences:
        mask_dir = os.path.join(davis_root, "Annotations", "480p", seq)
        mask_files = sorted(os.listdir(mask_dir))
        gts, preds = [], []
        for fn in mask_files[1:-1]:  # semi-supervised protocol trims ends
            gt = np.asarray(Image.open(os.path.join(mask_dir, fn)))
            pred_path = os.path.join(results_dir, seq, fn)
            if not os.path.exists(pred_path):
                continue
            pred = np.asarray(Image.open(pred_path))
            gts.append(gt)
            preds.append(pred)
        if not gts:
            continue
        gts = np.stack(gts)
        preds = np.stack(preds)
        n_obj = int(gts.max())
        for obj in range(1, n_obj + 1):
            j = davis_eval_iou(gts == obj, preds == obj)
            f = davis_eval_boundary(gts == obj, preds == obj)
            jm, jr, jd = davis_statistics(j)
            fm, fr, fd = davis_statistics(f)
            metrics["J"]["M"].append(jm)
            metrics["J"]["R"].append(jr)
            metrics["J"]["D"].append(jd)
            metrics["F"]["M"].append(fm)
            metrics["F"]["R"].append(fr)
            metrics["F"]["D"].append(fd)
            per_seq[f"{seq}_{obj}"] = {"J": jm, "F": fm}

    summary = {
        "J&F-Mean": float(
            (np.mean(metrics["J"]["M"]) + np.mean(metrics["F"]["M"])) / 2
        ),
        "J-Mean": float(np.mean(metrics["J"]["M"])),
        "J-Recall": float(np.mean(metrics["J"]["R"])),
        "J-Decay": float(np.mean(metrics["J"]["D"])),
        "F-Mean": float(np.mean(metrics["F"]["M"])),
        "F-Recall": float(np.mean(metrics["F"]["R"])),
        "F-Decay": float(np.mean(metrics["F"]["D"])),
    }
    return summary, per_seq
