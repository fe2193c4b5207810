"""Dataset wrappers, padded-batch collation, and a threaded prefetch loader.

- ``CASDataset``: class-aware sampling — ``__getitem__`` ignores the index,
  samples a uniform class then a uniform image containing it (reference
  nuhtc/datasets/dataset_wrappers.py:36-43).
- ``SemiDataset``: sup/unsup concat (reference dataset_wrappers.py:7).
- ``collate_train``: converts pipeline outputs into the padded tensor batch
  the jit train step consumes (gt boxes/labels/valid, 64×64 per-instance
  mask patches, stride-4 semantic target).
- ``PrefetchLoader``: host threads decode + augment while the device computes
  (the TPU replacement for torch DataLoader worker processes,
  reference nuhtc/datasets/builder.py:43-92).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, List, Optional

import cv2
import numpy as np

from nuhtc_tpu.ops import rle as rle_ops
from nuhtc_tpu.data.pipelines import run_pipeline

PATCH_SIZE = 64  # per-instance GT mask patch resolution


class CASDataset:
    """Class-aware sampling wrapper."""

    def __init__(self, dataset, **kwargs):
        self.dataset = dataset
        self.class_index = dataset.build_class_index()
        self.classes = sorted(self.class_index.keys())
        self.CLASSES = dataset.CLASSES
        self.PALETTE = getattr(dataset, "PALETTE", None)

    def __len__(self):
        return len(self.dataset)

    def sample_index(self, rng: np.random.RandomState) -> int:
        c = self.classes[rng.randint(len(self.classes))]
        imgs = self.class_index[c]
        return imgs[rng.randint(len(imgs))]

    def __getattr__(self, name):
        return getattr(self.dataset, name)


class SemiDataset:
    """Concatenation of a supervised and an unsupervised dataset."""

    def __init__(self, sup, unsup=None, **kwargs):
        self.sup = sup
        self.unsup = unsup
        self.CLASSES = sup.CLASSES

    def __len__(self):
        return len(self.sup) + (len(self.unsup) if self.unsup else 0)


def prepare_train_sample(dataset, idx: int, pipeline, rng: np.random.RandomState) -> Optional[dict]:
    """Load + decode + augment one sample → pipeline results dict, or None
    when a crop transform rejects the sample (re-sample another index)."""
    img = dataset.load_image(idx).astype(np.float32)
    ann = dataset.get_ann_info(idx)
    masks = (
        np.stack([rle_ops.decode(m) for m in ann["masks"]])
        if len(ann["masks"])
        else np.zeros((0,) + img.shape[:2], np.uint8)
    )
    seg = dataset.load_semantic(idx)
    if seg is None:
        # derive the binary semantic map from instance masks
        seg = (masks.sum(0) > 0).astype(np.uint8) if len(masks) else np.zeros(img.shape[:2], np.uint8)
    results = dict(
        img=img,
        gt_bboxes=ann["bboxes"],
        gt_labels=ann["labels"],
        gt_masks=masks,
        gt_semantic_seg=seg,
        ismask=ann.get("ismask"),
        # FOVCrop reads img_info['fovloc'] (reference resize_scale.py:423)
        img_info=dataset.img_info(idx) if hasattr(dataset, "img_info") else None,
    )
    return run_pipeline(pipeline, results, rng)


def sample_train_valid(dataset, idx_fn, pipeline, rng, max_tries: int = 50) -> dict:
    """Re-sample until the pipeline accepts a sample (mmdet
    CustomDataset.__getitem__: a None from the pipeline — e.g. RandomCrop
    with no gt box in the crop — picks another random index)."""
    for _ in range(max_tries):
        s = prepare_train_sample(dataset, idx_fn(rng), pipeline, rng)
        if s is not None:
            return s
    raise RuntimeError(
        f"pipeline rejected {max_tries} consecutive samples — check crop "
        "sizes vs annotation density (allow_negative_crop?)"
    )


def instance_patches(masks: np.ndarray, boxes: np.ndarray, size: int = PATCH_SIZE) -> np.ndarray:
    """Rasterize each instance mask inside its gt box at size×size."""
    n = len(masks)
    out = np.zeros((n, size, size), np.float32)
    h, w = masks.shape[1:] if n else (0, 0)
    for i in range(n):
        x1, y1, x2, y2 = boxes[i]
        xi1, yi1 = int(np.floor(x1)), int(np.floor(y1))
        xi2, yi2 = int(np.ceil(x2)), int(np.ceil(y2))
        xi1, yi1 = max(xi1, 0), max(yi1, 0)
        xi2, yi2 = min(max(xi2, xi1 + 1), w), min(max(yi2, yi1 + 1), h)
        crop = masks[i, yi1:yi2, xi1:xi2]
        out[i] = cv2.resize(crop.astype(np.float32), (size, size), interpolation=cv2.INTER_LINEAR)
    return out


def collate_train(samples: List[dict], max_gt: int = 160, sem_stride: int = 4) -> Dict[str, np.ndarray]:
    """Pipeline results → padded arrays for the jit train step."""
    b = len(samples)
    hs = max(s["img"].shape[0] for s in samples)
    ws = max(s["img"].shape[1] for s in samples)
    img = np.zeros((b, hs, ws, 3), np.float32)
    gt_boxes = np.zeros((b, max_gt, 4), np.float32)
    gt_labels = np.zeros((b, max_gt), np.int32)
    gt_valid = np.zeros((b, max_gt), bool)
    gt_patches = np.zeros((b, max_gt, PATCH_SIZE, PATCH_SIZE), np.float32)
    gt_ismask = np.ones((b, max_gt), np.float32)
    gt_sem = np.zeros((b, hs // sem_stride, ws // sem_stride), np.int32)

    for i, s in enumerate(samples):
        h, w = s["img"].shape[:2]
        img[i, :h, :w] = s["img"]
        n = min(len(s["gt_bboxes"]), max_gt)
        if n:
            gt_boxes[i, :n] = s["gt_bboxes"][:n]
            gt_labels[i, :n] = s["gt_labels"][:n]
            gt_valid[i, :n] = True
            # box-only annotations (NuCLS partial supervision) may carry
            # fewer masks than boxes — missing patches stay zero and are
            # flagged maskless so they contribute no mask loss
            nm = min(len(s["gt_masks"]), n)
            if nm:
                gt_patches[i, :nm] = instance_patches(s["gt_masks"][:nm], s["gt_bboxes"][:nm])
            if s.get("ismask") is not None:
                gt_ismask[i, :n] = s["ismask"][:n]
            elif nm < n:
                gt_ismask[i, nm:n] = 0.0
        seg = s.get("gt_semantic_seg")
        if seg is not None:
            th, tw = h // sem_stride, w // sem_stride
            if seg.shape[0] > th or seg.shape[1] > tw:
                # pipeline had no SegRescale — downsample to the target stride
                seg = cv2.resize(seg.astype(np.uint8), (tw, th),
                                 interpolation=cv2.INTER_NEAREST)
            sh, sw = seg.shape
            gt_sem[i, :sh, :sw] = seg
    return dict(
        img=img,
        gt_boxes=gt_boxes,
        gt_labels=gt_labels,
        gt_valid=gt_valid,
        gt_patches=gt_patches,
        gt_ismask=gt_ismask,
        gt_semantic=gt_sem,
    )


class SemiPrefetchLoader:
    """Threaded loader for teacher/student semi-supervised training
    (reference DistributedGroupSemiBalanceSampler + MultiBranch
    unsup_teacher/unsup_student pipelines, configs/nuhtc/base.py:180-222).

    Each batch carries ``sup_ratio`` supervised samples (full
    ``collate_train`` targets) plus unsupervised images in two aligned
    views: ``unsup_img_teacher`` (weak — geometric-only pipeline) and
    ``unsup_img`` (strong — the weak view pushed through an extra
    photometric-only pipeline, so pseudo boxes from the teacher view are
    valid on the student view without any transform matrix bookkeeping).
    """

    def __init__(
        self,
        semi_dataset,
        pipeline,
        strong_pipeline=None,
        batch_size: int = 8,
        sup_ratio: float = 0.5,
        max_gt: int = 160,
        seed: int = 0,
        num_threads: int = 2,
        prefetch: int = 4,
    ):
        from nuhtc_tpu.data.pipelines import Normalize, PhotoMetricDistortion

        self.sup = semi_dataset.sup
        self.unsup = semi_dataset.unsup or semi_dataset.sup
        self.pipeline = pipeline
        self.strong = (
            strong_pipeline if strong_pipeline is not None else [PhotoMetricDistortion()]
        )
        # the unsup views bypass the sup pipeline (no GT to transform) but
        # MUST match its normalization — the teacher/student forwards expect
        # the same input distribution as the supervised branch
        self._norm = next(
            (t for t in (pipeline or []) if isinstance(t, Normalize)), Normalize()
        )
        self.batch_size = max(int(round(batch_size * sup_ratio)), 1)  # sup part
        self.n_unsup = batch_size - self.batch_size
        if self.n_unsup <= 0:
            raise ValueError(
                f"SemiPrefetchLoader needs sup_ratio < 1 to leave room for "
                f"unsup samples (batch_size={batch_size}, sup_ratio={sup_ratio})"
            )
        self.max_gt = max_gt
        self.seed = seed
        self.num_threads = num_threads
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._threads: List[threading.Thread] = []
        self._counter = 0
        self._lock = threading.Lock()
        self._err: Optional[BaseException] = None

    def _next_seed(self):
        with self._lock:
            s = self._counter
            self._counter += 1
        return s

    def _unsup_views(self, idx: int, hs: int, ws: int, rng) -> tuple:
        """Load one unsup image → (weak, strong) views at (hs, ws)."""
        img = self.unsup.load_image(idx).astype(np.float32)
        h, w = img.shape[:2]
        if (h, w) != (hs, ws):
            if h >= hs and w >= ws:  # random crop
                y0 = rng.randint(h - hs + 1)
                x0 = rng.randint(w - ws + 1)
                img = img[y0 : y0 + hs, x0 : x0 + ws]
            else:
                img = cv2.resize(img, (ws, hs), interpolation=cv2.INTER_LINEAR)
        # photometric strong augs operate on raw 0-255 pixels; BOTH views
        # then normalize exactly like the supervised pipeline does
        res = dict(img=img.copy(), gt_bboxes=np.zeros((0, 4), np.float32),
                   gt_labels=np.zeros((0,), np.int64))
        strong_raw = run_pipeline(self.strong, res, rng)["img"]
        weak = self._norm({"img": img})["img"]
        strong = self._norm({"img": strong_raw})["img"]
        return weak, strong

    def _worker(self):
        try:
            self._worker_loop()
        except BaseException as e:  # surface worker crashes to the consumer
            self._err = e
            self._stop.set()

    def _worker_loop(self):
        while not self._stop.is_set():
            seq = self._next_seed()
            rng = np.random.RandomState(self.seed + seq)
            sup_samples = [
                sample_train_valid(
                    self.sup, lambda r: r.randint(len(self.sup)), self.pipeline, rng
                )
                for _ in range(self.batch_size)
            ]
            batch = collate_train(sup_samples, max_gt=self.max_gt)
            hs, ws = batch["img"].shape[1:3]
            weak = np.zeros((self.n_unsup, hs, ws, 3), np.float32)
            strong = np.zeros((self.n_unsup, hs, ws, 3), np.float32)
            for i in range(self.n_unsup):
                weak[i], strong[i] = self._unsup_views(
                    rng.randint(len(self.unsup)), hs, ws, rng
                )
            batch["unsup_img"] = strong
            batch["unsup_img_teacher"] = weak
            while not self._stop.is_set():
                try:
                    self._q.put((seq, batch), timeout=0.5)
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if not self._threads:
            for _ in range(self.num_threads):
                t = threading.Thread(target=self._worker, daemon=True)
                t.start()
                self._threads.append(t)
        while True:
            yield _ordered_get(self)

    def close(self):
        self._stop.set()


def _ordered_get(loader):
    """Emit worker-produced batches in sequence order.

    Workers tag each batch with the seed counter it was built from; the
    consumer buffers out-of-order arrivals so a fixed seed yields the SAME
    batch sequence every run regardless of thread scheduling (two runs of
    tools/train.py --seed 0 previously diverged because whichever thread won
    the race enqueued first). The buffer is bounded: at most num_threads
    batches can arrive ahead of the next expected sequence number."""
    pending = loader.__dict__.setdefault("_pending", {})
    nxt = loader.__dict__.setdefault("_next_emit", 0)
    while nxt not in pending:
        try:
            seq, batch = loader._q.get(timeout=1.0)
            pending[seq] = batch
        except queue.Empty:
            if loader._err is not None:
                raise RuntimeError(
                    f"{type(loader).__name__} worker crashed"
                ) from loader._err
    loader._next_emit = nxt + 1
    return pending.pop(nxt)


class PrefetchLoader:
    """Threaded train loader: CAS/random sampling + pipeline + collation."""

    def __init__(
        self,
        dataset,
        pipeline,
        batch_size: int = 8,
        max_gt: int = 160,
        seed: int = 0,
        num_threads: int = 2,
        prefetch: int = 4,
        class_aware: Optional[bool] = None,
    ):
        self.dataset = dataset
        self.pipeline = pipeline
        self.batch_size = batch_size
        self.max_gt = max_gt
        self.seed = seed
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.class_aware = (
            class_aware if class_aware is not None else isinstance(dataset, CASDataset)
        )
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._threads: List[threading.Thread] = []
        self._counter = 0
        self._lock = threading.Lock()
        self._err: Optional[BaseException] = None

    def _next_seed(self):
        with self._lock:
            s = self._counter
            self._counter += 1
        return s

    def _worker(self):
        try:
            self._worker_loop()
        except BaseException as e:  # surface worker crashes to the consumer
            self._err = e
            self._stop.set()

    def _worker_loop(self):
        inner = self.dataset.dataset if isinstance(self.dataset, CASDataset) else self.dataset
        while not self._stop.is_set():
            seq = self._next_seed()
            rng = np.random.RandomState(self.seed + seq)
            samples = []
            idx_fn = (
                (lambda r: self.dataset.sample_index(r))
                if self.class_aware
                else (lambda r: r.randint(len(inner)))
            )
            for _ in range(self.batch_size):
                samples.append(sample_train_valid(inner, idx_fn, self.pipeline, rng))
            batch = collate_train(samples, max_gt=self.max_gt)
            while not self._stop.is_set():
                try:
                    self._q.put((seq, batch), timeout=0.5)
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if not self._threads:
            for _ in range(self.num_threads):
                t = threading.Thread(target=self._worker, daemon=True)
                t.start()
                self._threads.append(t)
        while True:
            yield _ordered_get(self)

    def close(self):
        self._stop.set()
