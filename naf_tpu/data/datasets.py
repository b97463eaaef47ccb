"""Dataset readers (reference evaluation/dataset/*), PIL + numpy.

Each dataset yields dicts {"image": (H, W, 3) float32 [0,1]-transformed,
"label": (H', W') int32} matching the reference contract
(e.g. evaluation/dataset/ade20k.py:224-231). Ignore label is 255 (or -1 for
COCO coarse consistency, remapped to 255 here for the probe).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Callable, Optional

import numpy as np
from PIL import Image

from naf_tpu.data.coco_mapping import FINE_TO_COARSE

__all__ = [
    "ImageFolderDataset",
    "ADE20KDataset",
    "CityscapesDataset",
    "COCOStuffDataset",
    "VOCDataset",
    "KITTI360Dataset",
    "DAVISFramesDataset",
]

IGNORE = 255


class _SegDataset:
    """Shared (image, label) loading given path pairs + transforms."""

    def __init__(self, pairs, transform, target_transform):
        self.pairs = pairs
        self.transform = transform
        self.target_transform = target_transform

    def __len__(self):
        return len(self.pairs)

    def _load(self, index):
        img_path, lbl_path = self.pairs[index]
        image = Image.open(img_path).convert("RGB")
        label = Image.open(lbl_path)
        image = self.transform(image) if self.transform else np.asarray(image)
        label = (
            self.target_transform(label)
            if self.target_transform
            else np.asarray(label).astype(np.int32)
        )
        return image, label

    def __getitem__(self, index):
        image, label = self._load(index)
        return {"image": image, "label": label}


class ImageFolderDataset:
    """ImageNet-style class folders with a cached file listing
    (reference evaluation/dataset/image_dataset.py:16-118). Labels are class
    indices; cached listing at `<root>.txt` avoids directory walks."""

    EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")

    def __init__(self, root: str, transform: Optional[Callable] = None,
                 root_cache: Optional[str] = None, num_classes=None, tag=None):
        self.root = root
        self.transform = transform
        cache = (root_cache or root).rstrip("/") + ".txt"
        if os.path.exists(cache):
            with open(cache) as f:
                rel = [l.strip() for l in f if l.strip()]
        else:
            rel = []
            for dirpath, _, files in sorted(os.walk(root)):
                for fn in sorted(files):
                    if fn.lower().endswith(self.EXTS):
                        rel.append(
                            os.path.relpath(os.path.join(dirpath, fn), root)
                        )
            try:
                with open(cache, "w") as f:
                    f.write("\n".join(rel))
            except OSError:
                pass
        self.samples = [os.path.join(root, r) for r in rel]
        classes = sorted({os.path.dirname(r) for r in rel})
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.targets = [self.class_to_idx[os.path.dirname(r)] for r in rel]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index):
        image = Image.open(self.samples[index]).convert("RGB")
        if self.transform:
            image = self.transform(image)
        return {"image": image, "label": self.targets[index]}


class ADE20KDataset(_SegDataset):
    """ADE20K SceneParsing, 151 classes incl. background
    (evaluation/dataset/ade20k.py:9-231)."""

    SPLIT_DIR = {"train": "training", "val": "validation"}
    NUM_CLASSES = 151

    def __init__(self, root, transform=None, target_transform=None,
                 split="train", check_sizes=False,
                 num_classes=None, tag=None):
        image_dir = os.path.join(root, f"images/{self.SPLIT_DIR[split]}")
        ann_dir = os.path.join(root, f"annotations/{self.SPLIT_DIR[split]}")
        images = sorted(os.listdir(image_dir))
        anns = sorted(os.listdir(ann_dir))
        pairs = [
            (os.path.join(image_dir, i), os.path.join(ann_dir, a))
            for i, a in zip(images, anns)
        ]
        if check_sizes:
            expect = {"train": 20210, "val": 2000}[split]
            assert len(pairs) == expect, (len(pairs), expect)
        super().__init__(pairs, transform, target_transform)


# Cityscapes 34 raw ids -> 19 train ids (-1 = ignore); canonical mapping
# from cityscapesScripts (same as evaluation/dataset/cityscapes.py:36-43).
_CITYSCAPES_KEY = np.array(
    [-1, -1, -1, -1, -1, -1, -1, 0, 1, -1, -1, 2, 3, 4, -1, -1, -1, 5, -1,
     6, 7, 8, 9, 10, 11, 12, 13, 14, 15, -1, -1, 16, 17, 18], np.int32
)


class CityscapesDataset(_SegDataset):
    """Cityscapes fine semantic segmentation, 19 train classes
    (evaluation/dataset/cityscapes.py)."""

    NUM_CLASSES = 19

    def __init__(self, root, transform=None, target_transform=None,
                 split="train", check_sizes=False,
                 num_classes=None, tag=None):
        img_root = os.path.join(root, "leftImg8bit", split)
        lbl_root = os.path.join(root, "gtFine", split)
        pairs = []
        for city in sorted(os.listdir(img_root)):
            for fn in sorted(os.listdir(os.path.join(img_root, city))):
                lbl = fn.replace("_leftImg8bit.png", "_gtFine_labelIds.png")
                pairs.append(
                    (os.path.join(img_root, city, fn),
                     os.path.join(lbl_root, city, lbl))
                )
        if check_sizes:
            expect = {"train": 2975, "val": 500}[split]
            assert len(pairs) == expect
        super().__init__(pairs, transform, target_transform)

    def __getitem__(self, index):
        image, label = self._load(index)
        label = _CITYSCAPES_KEY[np.clip(label, 0, len(_CITYSCAPES_KEY) - 1)]
        label = np.where(label < 0, IGNORE, label).astype(np.int32)
        return {"image": image, "label": label}


class COCOStuffDataset(_SegDataset):
    """COCO-Stuff with 27 coarse classes (evaluation/dataset/coco.py)."""

    NUM_CLASSES = 27

    def __init__(self, root, transform=None, target_transform=None,
                 split="train", coarse_labels=True, check_sizes=False,
                 num_classes=None, tag=None):
        img_dir = os.path.join(root, "images", f"{split}2017")
        lbl_dir = os.path.join(root, "annotations", f"{split}2017")
        pairs = [
            (os.path.join(img_dir, f),
             os.path.join(lbl_dir, f.replace(".jpg", ".png")))
            for f in sorted(os.listdir(img_dir))
        ]
        if check_sizes:
            expect = {"train": 97702, "val": 4172}[split]
            assert len(pairs) == expect
        super().__init__(pairs, transform, target_transform)
        self.coarse_labels = coarse_labels
        lut = np.full(256, -1, np.int32)
        for fine, coarse in FINE_TO_COARSE.items():
            lut[fine] = coarse
        self._lut = lut

    def __getitem__(self, index):
        image, label = self._load(index)
        coarse = self._lut[np.clip(label, 0, 255)]
        coarse = np.where(label == 255, -1, coarse)  # coco.py:297
        out = coarse if self.coarse_labels else label
        out = np.where(out < 0, IGNORE, out).astype(np.int32)
        return {"image": image, "label": out}


class VOCDataset(_SegDataset):
    """PASCAL VOC2012 segmentation, 21 classes (evaluation/dataset/voc.py)."""

    NUM_CLASSES = 21

    def __init__(self, root, transform=None, target_transform=None,
                 split="train", check_sizes=False,
                 num_classes=None, tag=None):
        base = os.path.join(root, "VOCdevkit", "VOC2012")
        if not os.path.isdir(base):
            base = root
        with open(
            os.path.join(base, "ImageSets", "Segmentation", f"{split}.txt")
        ) as f:
            names = [l.strip() for l in f if l.strip()]
        pairs = [
            (os.path.join(base, "JPEGImages", f"{n}.jpg"),
             os.path.join(base, "SegmentationClass", f"{n}.png"))
            for n in names
        ]
        if check_sizes:
            expect = {"train": 1464, "val": 1449}[split]
            assert len(pairs) == expect
        super().__init__(pairs, transform, target_transform)


# KITTI-360 uses the Cityscapes id->trainId mapping (same label set;
# evaluation/dataset/kitti360.py:14-68).
class KITTI360Dataset(_SegDataset):
    """KITTI-360 semantics with a self-generated 80/20 split json
    (evaluation/dataset/kitti360.py:110-155)."""

    NUM_CLASSES = 19

    def __init__(self, root, transform=None, target_transform=None,
                 split="train", split_file=None, seed=0,
                 num_classes=None, tag=None):
        img_glob = os.path.join(
            root, "data_2d_raw", "*", "image_00", "data_rect", "*.png"
        )
        lbl_glob = os.path.join(
            root, "data_2d_semantics", "train", "*", "image_00", "semantic", "*.png"
        )
        labels = sorted(glob.glob(lbl_glob))
        pairs = []
        for lbl in labels:
            parts = lbl.split(os.sep)
            seq, fn = parts[-4], parts[-1]
            img = os.path.join(root, "data_2d_raw", seq, "image_00", "data_rect", fn)
            if os.path.exists(img):
                pairs.append((img, lbl))

        split_file = split_file or os.path.join(root, "naf_split.json")
        if os.path.exists(split_file):
            with open(split_file) as f:
                idx = json.load(f)[split]
        else:
            rng = np.random.RandomState(seed)
            perm = rng.permutation(len(pairs))
            cut = int(len(pairs) * 0.8)
            splits = {"train": perm[:cut].tolist(), "val": perm[cut:].tolist()}
            try:
                with open(split_file, "w") as f:
                    json.dump(splits, f)
            except OSError:
                pass
            idx = splits[split]
        super().__init__([pairs[i] for i in idx], transform, target_transform)

    def __getitem__(self, index):
        image, label = self._load(index)
        label = _CITYSCAPES_KEY[np.clip(label, 0, len(_CITYSCAPES_KEY) - 1)]
        label = np.where(label < 0, IGNORE, label).astype(np.int32)
        return {"image": image, "label": label}


class DAVISFramesDataset(_SegDataset):
    """DAVIS 2017 per-frame dataset (evaluation/dataset/davis.py)."""

    def __init__(self, root, transform=None, target_transform=None, split="val",
                 num_classes=None, tag=None):
        with open(os.path.join(root, "ImageSets", "2017", f"{split}.txt")) as f:
            videos = [l.strip() for l in f if l.strip()]
        pairs = []
        for video in videos:
            frames = sorted(
                glob.glob(os.path.join(root, "JPEGImages", "480p", video, "*.jpg"))
            )
            for fr in frames:
                pairs.append(
                    (fr, fr.replace("JPEGImages", "Annotations").replace(".jpg", ".png"))
                )
        super().__init__(pairs, transform, target_transform)
        self.videos = videos
