"""Build the committed real-image eval shard (benchmarks/real_shard/).

The environment has no network egress, so no ADE20K/DAVIS split can be
staged; what IS available offline are three real photographs bundled with
scikit-learn (china.jpg, flower.jpg — BSD) and matplotlib
(grace_hopper.jpg — public domain). This script turns them into a tiny
frozen shard in the exact directory layouts the dataset readers expect
(naf_tpu/data/datasets.py: ADE20KDataset, DAVISFramesDataset), so the REAL
reader + transform + harness code paths run end to end on real pixels:

  ade20k/images/{training,validation}/*.jpg     256^2 crops of the photos
  ade20k/annotations/{training,validation}/*.png  procedural labels
  davis/JPEGImages/480p/<video>/*.jpg           crop-trajectory "videos"
  davis/Annotations/480p/<video>/*.png          per-frame object masks
  davis/ImageSets/2017/val.txt

Labels are DETERMINISTIC PROCEDURAL ANNOTATIONS (k-means over Lab color +
position, fixed seed, fit on each full photo then sampled per crop) — real
images, machine-made ground truth. They are NOT human semantic labels;
absolute mIoU/J&F on this shard measures harness correctness and relative
upsampler quality, not ADE20K/DAVIS leaderboard standing. The same crop
window that cuts a video frame cuts its mask, so DAVIS ground truth is
exact by construction.

Everything is seeded; re-running reproduces the shard bit-for-bit (PNG
masks; JPEG quality 95 images).
"""

import os
import sys

import numpy as np
from PIL import Image

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "benchmarks", "real_shard")
N_CLASSES = 7  # procedural label classes per photo (shared id space)
CROP = 256
SEED = 0


def load_photos():
    """The three real photographs reachable offline."""
    from sklearn.datasets import load_sample_images

    photos = {}
    imgs = load_sample_images()
    for name, arr in zip(["china", "flower"], imgs.images):
        photos[name] = np.asarray(arr, np.uint8)
    try:
        import matplotlib.cbook as cbook

        with Image.open(cbook.get_sample_data("grace_hopper.jpg")) as im:
            photos["hopper"] = np.asarray(im.convert("RGB"), np.uint8)
    except Exception as e:  # matplotlib sample data is optional
        print(f"grace_hopper unavailable ({e}); shard uses 2 photos")
    return photos


def _rgb_to_lab_ish(rgb: np.ndarray) -> np.ndarray:
    """Cheap opponent-color transform (no colorspace dep): L, R-G, B-Y."""
    f = rgb.astype(np.float64) / 255.0
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    return np.stack([(r + g + b) / 3.0, r - g, b - (r + g) / 2.0], -1)


def procedural_labels(rgb: np.ndarray, k: int = N_CLASSES, seed: int = SEED):
    """K-means over (Lab-ish color, xy) -> per-pixel class ids in [0, k).

    Cluster ids are re-indexed by descending pixel count so the id space is
    stable across runs; a 3x3 majority vote smooths speckle.
    """
    from scipy.ndimage import median_filter
    from sklearn.cluster import KMeans

    h, w, _ = rgb.shape
    lab = _rgb_to_lab_ish(rgb)
    yy, xx = np.mgrid[0:h, 0:w]
    feat = np.concatenate(
        [lab * 3.0, (yy / h)[..., None], (xx / w)[..., None]], -1
    ).reshape(-1, 5)
    km = KMeans(n_clusters=k, n_init=4, random_state=seed).fit(
        feat[:: max(1, feat.shape[0] // 20000)]
    )
    lbl = km.predict(feat).reshape(h, w).astype(np.uint8)
    order = np.argsort(-np.bincount(lbl.ravel(), minlength=k))
    remap = np.empty(k, np.uint8)
    remap[order] = np.arange(k, dtype=np.uint8)
    return median_filter(remap[lbl], size=3)


def crops(h, w, n, rng):
    """n deterministic crop windows over an (h, w) photo."""
    out = []
    for _ in range(n):
        y = int(rng.randint(0, h - CROP + 1))
        x = int(rng.randint(0, w - CROP + 1))
        out.append((y, x))
    return out


def build_seg(photos, labels):
    rng = np.random.RandomState(SEED)
    for split, n_per in (("training", 6), ("validation", 3)):
        img_dir = os.path.join(ROOT, "ade20k", "images", split)
        ann_dir = os.path.join(ROOT, "ade20k", "annotations", split)
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(ann_dir, exist_ok=True)
        for name, rgb in photos.items():
            lbl = labels[name]
            for i, (y, x) in enumerate(
                crops(rgb.shape[0], rgb.shape[1], n_per, rng)
            ):
                stem = f"{name}_{split[:5]}_{i:02d}"
                Image.fromarray(rgb[y : y + CROP, x : x + CROP]).save(
                    os.path.join(img_dir, stem + ".jpg"), quality=95
                )
                Image.fromarray(lbl[y : y + CROP, x : x + CROP]).save(
                    os.path.join(ann_dir, stem + ".png")
                )


def extend_training(photos, labels, n_extra_per: int, seed: int = SEED + 1):
    """APPEND extra training crops (seed offset so the existing 18 train
    and 9 val files stay bit-identical — the committed eval baselines in
    benchmarks/real_eval.json reference the original validation split).
    Used for the reference-budget distillation run (25k steps need more
    than 18 images' worth of crop diversity)."""
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(ROOT, "ade20k", "images", "training")
    ann_dir = os.path.join(ROOT, "ade20k", "annotations", "training")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)
    made = 0
    for name, rgb in photos.items():
        lbl = labels[name]
        for i, (y, x) in enumerate(
            crops(rgb.shape[0], rgb.shape[1], n_extra_per, rng)
        ):
            stem = f"{name}_extra_{i:03d}"
            Image.fromarray(rgb[y : y + CROP, x : x + CROP]).save(
                os.path.join(img_dir, stem + ".jpg"), quality=95
            )
            Image.fromarray(lbl[y : y + CROP, x : x + CROP]).save(
                os.path.join(ann_dir, stem + ".png")
            )
            made += 1
    print(f"appended {made} extra training crops")


def build_davis(photos, labels):
    """Two 8-frame 'videos': a crop window translating across the photo.

    Masks keep the procedural class ids (DAVIS-style: 0 treated as
    background, others as objects); frame t's mask is the same window of
    the full-photo labels, so propagation ground truth is exact.
    """
    sets_dir = os.path.join(ROOT, "davis", "ImageSets", "2017")
    os.makedirs(sets_dir, exist_ok=True)
    videos = []
    for name in list(photos)[:2]:
        rgb, lbl = photos[name], labels[name]
        h, w, _ = rgb.shape
        video = f"{name}_pan"
        videos.append(video)
        jdir = os.path.join(ROOT, "davis", "JPEGImages", "480p", video)
        adir = os.path.join(ROOT, "davis", "Annotations", "480p", video)
        os.makedirs(jdir, exist_ok=True)
        os.makedirs(adir, exist_ok=True)
        n_frames = 8
        for t in range(n_frames):
            # linear pan corner-to-corner
            y = round((h - CROP) * t / (n_frames - 1))
            x = round((w - CROP) * t / (n_frames - 1))
            Image.fromarray(rgb[y : y + CROP, x : x + CROP]).save(
                os.path.join(jdir, f"{t:05d}.jpg"), quality=95
            )
            m = Image.fromarray(lbl[y : y + CROP, x : x + CROP], mode="P")
            # DAVIS-style palette so indexed PNGs round-trip exactly
            pal = np.zeros((256, 3), np.uint8)
            pal[: N_CLASSES] = (np.arange(N_CLASSES)[:, None] * 37 + 40) % 256
            m.putpalette(pal.ravel().tolist())
            m.save(os.path.join(adir, f"{t:05d}.png"))
    with open(os.path.join(sets_dir, "val.txt"), "w") as f:
        f.write("\n".join(videos) + "\n")


def main(argv=()):
    photos = load_photos()
    print({k: v.shape for k, v in photos.items()})
    labels = {k: procedural_labels(v) for k, v in photos.items()}
    if argv and argv[0] == "--extend-train":
        extend_training(photos, labels, int(argv[1]) if len(argv) > 1 else 14)
    else:
        build_seg(photos, labels)
        build_davis(photos, labels)
    n_files = sum(len(fs) for _, _, fs in os.walk(ROOT))
    print(f"shard at {ROOT}: {n_files} files")


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
