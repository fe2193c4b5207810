from nuhtc_tpu.ops import boxes, anchors, nms, roi_align, morphology, components, mask_paste

__all__ = ["boxes", "anchors", "nms", "roi_align", "morphology", "components", "mask_paste"]
