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
    """Scale named loss terms by a step schedule (reference Weighter hook).

    jit-safe: schedules must be jnp-traceable (``step`` is a traced int32
    inside the train step); the total is recomputed as the sum of all
    non-"total" loss entries so the re-weighting shapes gradients."""

    def __init__(self, schedules: Dict[str, Callable[[int], float]]):
        self.schedules = schedules

    def __call__(self, losses: Dict, step: int) -> Dict:
        out = dict(losses)
        for name, fn in self.schedules.items():
            if name in out:
                out[name] = out[name] * fn(step)
        # aggregate keys ("total", "sup.total", …) must not feed the
        # recomputed sum — they'd double-count their constituent terms
        out["total"] = sum(
            v for k, v in out.items() if k != "total" and not k.endswith(".total")
        )
        return out


def piecewise_schedule(boundaries, values):
    """jnp-traceable piecewise-constant schedule: weight = values[i] for
    step in [boundaries[i-1], boundaries[i]) (len(values) = len(boundaries)+1)."""
    import jax.numpy as jnp

    boundaries = list(boundaries)
    values = list(values)
    assert len(values) == len(boundaries) + 1

    def fn(step):
        w = jnp.float32(values[0])
        for b, v in zip(boundaries, values[1:]):
            w = jnp.where(step >= b, jnp.float32(v), w)
        return w

    return fn


def build_weighter(cfg: Optional[Dict]) -> Optional[Weighter]:
    """Config → Weighter. ``cfg`` maps loss names to either a constant or
    ``dict(steps=[...], vals=[...])`` (piecewise-constant), e.g.
    ``loss_weight_schedules = {"s2.loss_mask": dict(steps=[10000], vals=[0.5, 1.0])}``."""
    if not cfg:
        return None
    schedules = {}
    for name, spec in cfg.items():
        if isinstance(spec, (int, float)):
            schedules[name] = (lambda v: lambda step: v)(float(spec))
        else:
            schedules[name] = piecewise_schedule(spec["steps"], spec["vals"])
    return Weighter(schedules)
