"""COCO-compatible RLE mask API (native C fast path + numpy fallback).

Drop-in equivalents of the pycocotools.mask functions the reference consumes
(encode/decode/area/toBbox/iou; reference nuhtc/models/htc_roi_head_cus.py:
234-236 and nuhtc/datasets/WSI_coco.py:366-370,660-730), implemented from the
RLE format spec on top of nuhtc_tpu/native/rle.c.

RLE dict format matches pycocotools: {"size": [h, w], "counts": bytes}.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from nuhtc_tpu.native.build import load_librle

_lib = None


def _get_lib():
    global _lib
    if _lib is None:
        _lib = load_librle() or False
    return _lib or None


# --------------------------------------------------------------------------- #
# numpy reference implementations (fallback + oracle for tests)
# --------------------------------------------------------------------------- #
def _np_counts_from_mask(mask: np.ndarray) -> np.ndarray:
    flat = np.asfortranarray(mask).ravel(order="F").astype(np.uint8)
    flat = (flat > 0).astype(np.uint8)
    if flat.size == 0:
        return np.zeros(1, np.uint32)
    change = np.nonzero(np.diff(flat))[0] + 1
    bounds = np.concatenate([[0], change, [flat.size]])
    counts = np.diff(bounds)
    if flat[0] == 1:  # runs must start with a zero-run
        counts = np.concatenate([[0], counts])
    return counts.astype(np.uint32)


def _np_mask_from_counts(counts: np.ndarray, h: int, w: int) -> np.ndarray:
    total = int(counts.sum())
    vals = np.zeros(len(counts), np.uint8)
    vals[1::2] = 1
    flat = np.repeat(vals, counts.astype(np.int64))
    if flat.size < h * w:
        flat = np.concatenate([flat, np.zeros(h * w - flat.size, np.uint8)])
    return flat[: h * w].reshape((h, w), order="F")


def _np_string_encode(counts: np.ndarray) -> bytes:
    out = bytearray()
    counts = counts.astype(np.int64)
    for i, c in enumerate(counts):
        x = int(c if i <= 2 else c - counts[i - 2])
        more = True
        while more:
            piece = x & 0x1F
            x >>= 5
            more = (x != -1) if (piece & 0x10) else (x != 0)
            if more:
                piece |= 0x20
            out.append(piece + 48)
    return bytes(out)


def _np_string_decode(s: bytes) -> np.ndarray:
    counts: List[int] = []
    p = 0
    n = len(s)
    while p < n:
        x = 0
        k = 0
        more = True
        while more:
            c = s[p] - 48
            p += 1
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            if not more and (c & 0x10):
                x |= -1 << (5 * (k + 1))
            k += 1
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return np.asarray(counts, np.uint32)


# --------------------------------------------------------------------------- #
# public API
# --------------------------------------------------------------------------- #
def encode(mask: np.ndarray) -> Dict:
    """Binary mask (H, W) → RLE dict with compressed bytes counts."""
    h, w = mask.shape
    lib = _get_lib()
    if lib is not None:
        import ctypes

        fmask = np.ascontiguousarray(np.asfortranarray(mask).ravel(order="F"), np.uint8)
        cap = h * w + 2
        counts = np.empty(cap, np.uint32)
        m = lib.rle_encode(
            fmask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            h,
            w,
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            cap,
        )
        counts = counts[:m]
        sbuf = ctypes.create_string_buffer(6 * m + 16)
        slen = lib.rle_string_encode(
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), m, sbuf, len(sbuf)
        )
        return {"size": [h, w], "counts": sbuf.raw[:slen]}
    counts = _np_counts_from_mask(mask)
    return {"size": [h, w], "counts": _np_string_encode(counts)}


def _counts_of(rle: Dict) -> np.ndarray:
    c = rle["counts"]
    if isinstance(c, (list, tuple, np.ndarray)):
        return np.asarray(c, np.uint32)
    if isinstance(c, str):
        c = c.encode()
    lib = _get_lib()
    if lib is not None:
        import ctypes

        cap = len(c) + 4
        counts = np.empty(cap, np.uint32)
        m = lib.rle_string_decode(
            c, len(c), counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), cap
        )
        return counts[:m]
    return _np_string_decode(c)


def decode(rle: Dict) -> np.ndarray:
    h, w = rle["size"]
    counts = _counts_of(rle)
    lib = _get_lib()
    if lib is not None:
        import ctypes

        mask = np.zeros(h * w, np.uint8)
        lib.rle_decode(
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            len(counts),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            h * w,
        )
        return mask.reshape((h, w), order="F")
    return _np_mask_from_counts(counts, h, w)


def area(rle: Dict) -> int:
    counts = _counts_of(rle)
    return int(counts[1::2].sum())


def toBbox(rle: Dict) -> np.ndarray:
    """[x, y, w, h] tight bbox."""
    h, w = rle["size"]
    counts = _counts_of(rle).astype(np.int64)
    ends = np.cumsum(counts)
    starts = ends - counts
    fg = np.arange(len(counts)) % 2 == 1
    s, e = starts[fg], ends[fg] - 1
    if len(s) == 0 or counts[fg].sum() == 0:
        return np.zeros(4)
    cols_s, cols_e = s // h, e // h
    x1, x2 = cols_s.min(), cols_e.max()
    if (cols_s == cols_e).all():
        y1, y2 = (s % h).min(), (e % h).max()
    else:
        # a run spanning a column boundary covers rows r1..h-1 and 0..r2
        y1, y2 = 0, h - 1
    return np.array([x1, y1, x2 - x1 + 1, y2 - y1 + 1], np.float64)


def iou(dt: Sequence[Dict], gt: Sequence[Dict], iscrowd: Sequence[int] | None = None) -> np.ndarray:
    """Pairwise IoU matrix (len(dt), len(gt)); iscrowd → IoF for that gt."""
    nd, ng = len(dt), len(gt)
    if nd == 0 or ng == 0:
        return np.zeros((nd, ng))
    lib = _get_lib()
    dts = [_counts_of(r) for r in dt]
    gts = [_counts_of(r) for r in gt]
    crowd = np.asarray(iscrowd if iscrowd is not None else [0] * ng, np.uint8)
    if lib is not None:
        import ctypes

        dt_flat = np.concatenate(dts).astype(np.uint32)
        gt_flat = np.concatenate(gts).astype(np.uint32)
        dt_len = np.asarray([len(x) for x in dts], np.int64)
        gt_len = np.asarray([len(x) for x in gts], np.int64)
        dt_off = np.concatenate([[0], np.cumsum(dt_len)[:-1]]).astype(np.int64)
        gt_off = np.concatenate([[0], np.cumsum(gt_len)[:-1]]).astype(np.int64)
        out = np.zeros(nd * ng, np.float64)
        lib.rle_iou(
            dt_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            dt_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            dt_len.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            nd,
            gt_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            gt_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            gt_len.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ng,
            crowd.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return out.reshape(nd, ng)
    # numpy fallback
    h, w = dt[0]["size"]
    dmasks = np.stack([_np_mask_from_counts(c, h, w).ravel() for c in dts]).astype(np.float64)
    gmasks = np.stack([_np_mask_from_counts(c, h, w).ravel() for c in gts]).astype(np.float64)
    inter = dmasks @ gmasks.T
    da = dmasks.sum(1)[:, None]
    ga = gmasks.sum(1)[None, :]
    union = np.where(crowd[None, :] > 0, da, da + ga - inter)
    return np.where(union > 0, inter / np.maximum(union, 1), 0.0)


def merge(rles: Sequence[Dict], intersect: bool = False) -> Dict:
    """Union (or intersection) of RLEs (decode-merge-encode)."""
    h, w = rles[0]["size"]
    acc = None
    for r in rles:
        m = decode(r)
        acc = m if acc is None else ((acc & m) if intersect else (acc | m))
    return encode(acc.astype(np.uint8))
