"""Train API (reference nuhtc/apis/train.py: set_random_seed, train_detector)."""

from __future__ import annotations

import random
from typing import Optional

import numpy as np


def set_random_seed(seed: int, deterministic: bool = True):
    """Seed python/numpy; JAX keys are derived explicitly from ``seed``
    (functional PRNG — the deterministic flag is inherent)."""
    random.seed(seed)
    np.random.seed(seed)
    return seed


def train_detector(
    model,
    dataset,
    cfg,
    work_dir: str,
    test_dataset=None,
    resume_from: Optional[str] = None,
    seed: int = 0,
):
    """Convenience wrapper mirroring the reference train_detector entry."""
    from nuhtc_tpu.data.loader import PrefetchLoader
    from nuhtc_tpu.data.pipelines import build_train_pipeline
    from nuhtc_tpu.train.trainer import Trainer

    pipeline = build_train_pipeline(cfg.get("train_pipeline", []))
    loader = PrefetchLoader(
        dataset, pipeline, batch_size=cfg.get("samples_per_gpu", 8), seed=seed
    )
    trainer = Trainer(
        model,
        cfg,
        work_dir,
        max_epochs=cfg.get("max_epochs", 200),
        checkpoint_interval=cfg.get("checkpoint_interval", 10),
        eval_interval=cfg.get("evaluation", {}).get("interval", 10),
        seed=seed,
    )
    return trainer.run(loader, test_dataset, resume_from=resume_from)
