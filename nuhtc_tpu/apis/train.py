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
    """Convenience wrapper mirroring the reference train_detector entry.
    Mirrors tools/train.py's loader/epoch semantics: samples_per_gpu falls
    back to cfg.data.samples_per_gpu, iters_per_epoch derives from the
    dataset size, and SemiDataset routes to the semi loader."""
    from nuhtc_tpu.data.loader import PrefetchLoader, SemiDataset, SemiPrefetchLoader
    from nuhtc_tpu.data.pipelines import build_train_pipeline
    from nuhtc_tpu.train.trainer import Trainer

    pipeline = build_train_pipeline(cfg.get("train_pipeline", []))
    batch_size = cfg.get("samples_per_gpu", None) or cfg.get("data", {}).get(
        "samples_per_gpu", 8
    )
    if isinstance(dataset, SemiDataset):
        loader = SemiPrefetchLoader(
            dataset, pipeline,
            strong_pipeline=(
                build_train_pipeline(cfg["unsup_strong_pipeline"])
                if cfg.get("unsup_strong_pipeline") else None
            ),
            batch_size=batch_size, sup_ratio=cfg.get("sup_ratio", 0.5), seed=seed,
        )
    else:
        loader = PrefetchLoader(dataset, pipeline, batch_size=batch_size, seed=seed)
    trainer = Trainer(
        model,
        cfg,
        work_dir,
        max_epochs=cfg.get("max_epochs", 200),
        iters_per_epoch=max(len(dataset) // batch_size, 1),
        checkpoint_interval=cfg.get("checkpoint_interval", 10),
        eval_interval=cfg.get("evaluation", {}).get("interval", 10),
        seed=seed,
    )
    return trainer.run(loader, test_dataset, resume_from=resume_from)
