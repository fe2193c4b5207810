"""Visualization helpers for the analysis tools (reference
tools/analysis_tools/viz_utils.py): overlay rendering for detections and
ground truth, color palettes, side-by-side GT/pred panels. Thin layer over
nuhtc_tpu.utils.visualize."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from nuhtc_tpu.utils.visualize import DEFAULT_PALETTE, draw_detections  # noqa: F401


def imshow_gt_det(
    img: np.ndarray,
    gt_masks: Sequence[np.ndarray],
    gt_labels: Sequence[int],
    det_masks: Sequence[np.ndarray],
    det_labels: Sequence[int],
    det_scores: Optional[Sequence[float]] = None,
    palette=None,
    out_file: Optional[str] = None,
) -> np.ndarray:
    """Side-by-side GT | prediction panel (the reference's
    imshow_gt_det_bboxes analog used by analyze_results)."""
    left = draw_detections(img, gt_masks, gt_labels, palette=palette)
    right = draw_detections(img, det_masks, det_labels, scores=det_scores, palette=palette)
    panel = np.concatenate([left, np.full((img.shape[0], 4, 3), 255, np.uint8), right], axis=1)
    if out_file:
        import cv2

        cv2.imwrite(out_file, panel[..., ::-1])
    return panel


def overlay_instances(img: np.ndarray, inst_map: np.ndarray, palette=None) -> np.ndarray:
    """Render a labeled instance map (e.g. the compact WSI label map or a GT
    instance map) as a colored overlay."""
    ids = [int(i) for i in np.unique(inst_map) if i != 0]
    masks = [inst_map == i for i in ids]
    labels = [(i - 1) % len(palette or DEFAULT_PALETTE) for i in ids]
    return draw_detections(img, masks, labels, palette=palette)


def get_bounding_box(mask: np.ndarray):
    """[y1, y2, x1, x2] tight box of a binary mask (reference
    viz_utils.get_bounding_box convention: max side +1 past the last pixel)."""
    rows = np.any(mask, axis=1)
    cols = np.any(mask, axis=0)
    if not rows.any():
        return [0, 0, 0, 0]
    y1, y2 = np.where(rows)[0][[0, -1]]
    x1, x2 = np.where(cols)[0][[0, -1]]
    return [int(y1), int(y2) + 1, int(x1), int(x2) + 1]


def colorize(ch: np.ndarray, vmin: float | None = None, vmax: float | None = None) -> np.ndarray:
    """Scalar map → RGB uint8 via a jet-style colormap (reference
    viz_utils.colorize)."""
    import cv2

    vmin = float(np.min(ch)) if vmin is None else vmin
    vmax = float(np.max(ch)) if vmax is None else vmax
    ch = (np.clip((ch - vmin) / max(vmax - vmin, 1e-8), 0, 1) * 255).astype(np.uint8)
    return cv2.applyColorMap(ch, cv2.COLORMAP_JET)[..., ::-1]


def random_colors(n: int, bright: bool = True, seed: int = 0):
    """n visually-distinct RGB tuples (HSV hue sweep, shuffled)."""
    import colorsys

    brightness = 1.0 if bright else 0.7
    hsv = [(i / max(n, 1), 1, brightness) for i in range(n)]
    colors = [tuple(int(c * 255) for c in colorsys.hsv_to_rgb(*h)) for h in hsv]
    np.random.RandomState(seed).shuffle(colors)
    return colors


def visualize_instances_map(
    img: np.ndarray,  # RGB uint8
    inst_map: np.ndarray,  # (H, W) int instance ids (0 = background)
    type_map: np.ndarray | None = None,  # (H, W) int class ids (1-based)
    dataset: str = "pannuke",
    line_thickness: int = 2,
) -> np.ndarray:
    """Type-colored instance-boundary overlay from an instance map (+ optional
    type map) — the reference's per-dataset visualize_instances_map_{pannuke,
    conic,consep} unified behind a ``dataset`` switch; class colors come from
    the dataset classes (data/coco.py PALETTE)."""
    palettes = {
        "pannuke": _dataset_palette("PanNukeCocoDataset"),
        "conic": _dataset_palette("CoNICCocoDataset"),
        "consep": _dataset_palette("CoNSePCocoDataset"),
        "nucls": _dataset_palette("NuCLSCocoDataset"),
    }
    palette = palettes.get(dataset.lower()) or DEFAULT_PALETTE
    ids = [int(i) for i in np.unique(inst_map) if i != 0]
    masks, labels = [], []
    for i in ids:
        m = inst_map == i
        if type_map is not None:
            vals, counts = np.unique(type_map[m], return_counts=True)
            lbl = int(vals[np.argmax(counts)]) - 1  # majority type, 1-based map
            if lbl < 0:
                lbl = 0
        else:
            lbl = (i - 1) % len(palette)
        masks.append(m)
        labels.append(lbl)
    return draw_detections(img, masks, labels, palette=palette,
                           thickness=line_thickness)


def _dataset_palette(name: str):
    try:
        from nuhtc_tpu import data as _data  # noqa: F401
        import nuhtc_tpu.data.coco as coco_mod

        cls = getattr(coco_mod, name, None)
        return list(cls.PALETTE) if cls is not None and cls.PALETTE else None
    except Exception:
        return None


def gen_figure(panels, titles=None, out_file: str | None = None, pad: int = 4):
    """Horizontal multi-panel figure (reference viz_utils.gen_figure analog,
    cv2-based — matplotlib absent from the image)."""
    import cv2

    h = max(p.shape[0] for p in panels)
    norm = []
    for p in panels:
        if p.ndim == 2:
            p = colorize(p)
        if p.shape[0] != h:
            p = cv2.resize(p, (int(p.shape[1] * h / p.shape[0]), h))
        norm.append(p.astype(np.uint8))
    spacer = np.full((h, pad, 3), 255, np.uint8)
    row = norm[0]
    for p in norm[1:]:
        row = np.concatenate([row, spacer, p], axis=1)
    if titles:
        for i, t in enumerate(titles[: len(norm)]):
            x = sum(p.shape[1] + pad for p in norm[:i])
            cv2.putText(row, str(t), (x + 4, 18), cv2.FONT_HERSHEY_SIMPLEX,
                        0.5, (0, 0, 0), 1, cv2.LINE_AA)
    if out_file:
        cv2.imwrite(out_file, row[..., ::-1])
    return row


def main():
    """CLI: render an overlay from saved maps (reference viz_utils main):
    ``python viz_utils.py img.png --inst inst.npy [--type type.npy]
    [--dataset pannuke] [--out overlay.png]``."""
    import argparse
    import cv2

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("image")
    ap.add_argument("--inst", required=True, help=".npy instance map")
    ap.add_argument("--type", dest="type_map", default=None, help=".npy type map")
    ap.add_argument("--dataset", default="pannuke")
    ap.add_argument("--out", default="overlay.png")
    args = ap.parse_args()

    img = cv2.imread(args.image)[..., ::-1]
    inst = np.load(args.inst)
    tmap = np.load(args.type_map) if args.type_map else None
    out = visualize_instances_map(img, inst, tmap, dataset=args.dataset)
    cv2.imwrite(args.out, out[..., ::-1])
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
