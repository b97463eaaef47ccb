from naf_tpu.data.datasets import (  # noqa: F401
    ADE20KDataset,
    COCOStuffDataset,
    CityscapesDataset,
    DAVISFramesDataset,
    ImageFolderDataset,
    KITTI360Dataset,
    VOCDataset,
)
from naf_tpu.data.device_cache import (  # noqa: F401
    device_cached_batches,
    device_cached_stack,
)
from naf_tpu.data.loader import DataLoader  # noqa: F401
from naf_tpu.data.transforms import image_transform, label_transform  # noqa: F401

DATASET_REGISTRY = {
    "ade20k": ADE20KDataset,
    "cityscapes": CityscapesDataset,
    "coco": COCOStuffDataset,
    "voc": VOCDataset,
    "kitti360": KITTI360Dataset,
    "davis": DAVISFramesDataset,
    "imagefolder": ImageFolderDataset,
}
