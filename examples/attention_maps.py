"""Per-pixel attention heatmaps (reference notebooks/attention_maps.ipynb).

Uses the introspectable `return_weights=True` path (scaled pre-softmax
scores, one 9x9 window per query) and writes a heatmap panel for chosen
query pixels.

    python examples/attention_maps.py --pixels 100,100 300,220
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from naf_tpu.api import load_naf_params
from naf_tpu.ops.window import cross_scale_lr_indices


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", default=None)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--lr-size", type=int, default=28)
    ap.add_argument("--dim-feats", type=int, default=64)
    ap.add_argument("--pixels", nargs="+", default=["112,112"])
    ap.add_argument("--naf-ckpt", default=None)
    ap.add_argument("--out", default="attention_maps.png")
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    if args.image:
        from naf_tpu.data.transforms import image_transform

        img = image_transform(Image.open(args.image), args.size)
    else:
        y, x = np.mgrid[0 : args.size, 0 : args.size]
        img = np.stack(
            [np.sin(x / 19.0), np.cos(y / 13.0), np.sin((x - y) / 29.0)], -1
        ).astype(np.float32) * 0.5 + 0.5
    image = jnp.asarray(img)[None]
    feats = jnp.asarray(
        rng.randn(1, args.lr_size, args.lr_size, args.dim_feats).astype(np.float32)
    )

    model, params = load_naf_params(args.naf_ckpt, na_impl="xla")
    out, scores = model.apply(
        {"params": params}, image, feats, (args.size, args.size),
        return_weights=True,
    )
    # scores: (B, heads, H, W, k*k) scaled pre-softmax (reference contract)
    weights = jax.nn.softmax(scores, axis=-1).mean(axis=1)[0]  # (H, W, k2)
    kk = int(np.sqrt(weights.shape[-1]))
    idx = cross_scale_lr_indices(args.size, args.lr_size, kk)

    panels = [np.asarray(img)]
    for spec in args.pixels:
        i, j = (int(v) for v in spec.split(","))
        w = np.asarray(weights[i, j]).reshape(kk, kk)
        heat = np.zeros((args.lr_size, args.lr_size), np.float32)
        heat[np.ix_(idx[i], idx[j])] = w
        heat = heat / max(heat.max(), 1e-9)
        hm = np.asarray(
            Image.fromarray((heat * 255).astype(np.uint8)).resize(
                (args.size, args.size), Image.NEAREST
            ),
            np.float32,
        )[..., None] / 255.0
        overlay = np.asarray(img) * 0.4 + np.concatenate(
            [hm, np.zeros_like(hm), 1 - hm], -1
        ) * 0.6
        overlay[max(i - 2, 0) : i + 2, max(j - 2, 0) : j + 2] = [1, 1, 0]
        panels.append(overlay)

    panel = (np.concatenate(panels, axis=1) * 255).astype(np.uint8)
    Image.fromarray(panel).save(args.out)
    print(f"attention maps for {args.pixels} -> {args.out}")


if __name__ == "__main__":
    main()
