from nuhtc_tpu.models import swin, fpn, rpn_head, bbox_head, mask_head, roi_extractor, detector, losses, mask_rcnn  # noqa: F401
from nuhtc_tpu.models.build import build_detector  # noqa: F401

__all__ = ["build_detector"]
