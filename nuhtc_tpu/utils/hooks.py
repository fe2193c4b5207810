"""Training hooks (reference nuhtc/utils/hooks/ analogs).

- ``MaskVisHook``: periodic prediction-overlay rendering to the metric logger
  (reference mask_vis_hook.py:187-574);
- ``WeightSummary``: parameter table at run start (weights_summary.py:62);
- ``Weighter``: scheduled loss-weight adjustment (weight_adjust.py:7);
- EMA and FineTune (unfreeze) live in train_state.make_train_step;
- MeanTeacher lives in models.semi.

Hooks here are plain callables the Trainer invokes — no runner registry
machinery needed in the functional design.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np


class WeightSummary:
    def __call__(self, params, logger) -> None:
        import jax
        from flax import traverse_util

        flat = traverse_util.flatten_dict(params)
        total = 0
        lines = []
        for k, v in sorted(flat.items()):
            n = int(np.prod(v.shape))
            total += n
            lines.append(f"{'/'.join(map(str, k)):<80s} {str(v.shape):>20s} {n:>12,d}")
        logger.info("parameter summary:\n" + "\n".join(lines))
        logger.info(f"total parameters: {total / 1e6:.2f} M")


class MaskVisHook:
    """Render predictions on a fixed sample every ``interval`` steps."""

    def __init__(self, engine_factory: Callable, dataset, metric_logger, interval: int = 2000,
                 num_images: int = 2):
        self.engine_factory = engine_factory
        self.dataset = dataset
        self.metric_logger = metric_logger
        self.interval = interval
        self.num_images = num_images

    def maybe_log(self, step: int, params) -> None:
        if step % self.interval:
            return
        from nuhtc_tpu.utils.visualize import draw_detections

        engine = self.engine_factory(params)
        idxs = list(range(min(self.num_images, len(self.dataset))))
        imgs = [self.dataset.load_image(i) for i in idxs]
        for i, res in zip(idxs, engine.run_batch(imgs)):
            vis = draw_detections(
                imgs[i], res.get("masks", []), res["labels"],
                palette=getattr(self.dataset, "PALETTE", None),
            )
            self.metric_logger.log_image(f"train/pred_{i}", vis, step)


class Weighter:
    """Scale named loss terms by a step schedule (reference Weighter hook)."""

    def __init__(self, schedules: Dict[str, Callable[[int], float]]):
        self.schedules = schedules

    def __call__(self, losses: Dict, step: int) -> Dict:
        out = dict(losses)
        for name, fn in self.schedules.items():
            if name in out:
                out[name] = out[name] * fn(step)
        out["total"] = sum(v for k, v in out.items() if k != "total" and k.endswith(("loss", "cls", "bbox", "obj", "mask", "seg")))
        return out
