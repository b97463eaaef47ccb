"""Zero-shot upsampling demo (reference notebooks/inference.ipynb).

Any backbone, any resolution — including the 64 -> 1024 sweep. Saves a PCA
feature panel (image | LR features | NAF-upsampled features).

    python examples/inference.py --image photo.jpg \\
        --backbone-ckpt dinov2_small.pth --naf-ckpt naf_release.pth
    python examples/inference.py          # synthetic image, random weights
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np
from PIL import Image

from naf_tpu.api import load_naf_params
from naf_tpu.backbones import PretrainedViTWrapper
from naf_tpu.utils.visualization import plot_feats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", default=None)
    ap.add_argument("--backbone", default="vit_small_patch14_dinov2.lvd142m")
    ap.add_argument("--backbone-ckpt", default=None)
    ap.add_argument("--naf-ckpt", default=None)
    ap.add_argument("--img-size", type=int, default=448)
    ap.add_argument("--target-sizes", type=int, nargs="+", default=[448])
    ap.add_argument("--out", default="naf_panel.png")
    ap.add_argument("--f32", action="store_true",
                    help="float32 (bf16 default; odd ratios in f32 exceed "
                         "the fused kernel's VMEM and fall back to the "
                         "slower blocked-oracle path)")
    args = ap.parse_args()

    if args.image:
        from naf_tpu.data.transforms import image_transform

        img = image_transform(Image.open(args.image), args.img_size)
    else:
        print("no --image given; using a synthetic test pattern")
        y, x = np.mgrid[0 : args.img_size, 0 : args.img_size]
        img = np.stack(
            [np.sin(x / 23.0), np.cos(y / 17.0), np.sin((x + y) / 31.0)], -1
        ).astype(np.float32) * 0.5 + 0.5
    image = jnp.asarray(img)[None]

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    backbone = PretrainedViTWrapper(
        args.backbone, checkpoint=args.backbone_ckpt, dtype=dtype
    )
    model, params = load_naf_params(args.naf_ckpt)
    import jax

    params = jax.tree.map(lambda a: a.astype(dtype), params)
    image = image.astype(dtype)

    lr_feats = backbone(backbone.normalize(image))
    print(f"LR features: {lr_feats.shape}")

    mean = jnp.asarray((0.485, 0.456, 0.406))
    std = jnp.asarray((0.229, 0.224, 0.225))
    panels = [lr_feats]
    for ts in args.target_sizes:
        hr = model.apply(
            {"params": params}, (image - mean) / std, lr_feats, (ts, ts)
        )
        print(f"NAF {ts}x{ts}: {hr.shape}")
        panels.append(hr)

    plot_feats(np.asarray(image[0]), [np.asarray(p) for p in panels], args.out)
    print(f"panel written to {args.out}")


if __name__ == "__main__":
    main()
