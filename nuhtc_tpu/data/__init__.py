from nuhtc_tpu.data.coco import (
    COCO,
    WSICocoDataset,
    PanNukeCocoDataset,
    CoNSePCocoDataset,
    CoNICCocoDataset,
    NuCLSCocoDataset,
    build_dataset,
)

__all__ = [
    "COCO",
    "WSICocoDataset",
    "PanNukeCocoDataset",
    "CoNSePCocoDataset",
    "CoNICCocoDataset",
    "NuCLSCocoDataset",
    "build_dataset",
]
