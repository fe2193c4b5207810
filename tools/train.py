#!/usr/bin/env python
"""Train NuHTC-TPU (reference tools/train.py).

Usage: python tools/train.py configs/nuhtc/htc_lite_swin_fpn_pannuke.py \\
           [--work-dir DIR] [--resume-from CKPT] [--cfg-options k=v ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--work-dir", default=None)
    ap.add_argument("--resume-from", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-epochs", type=int, default=None)
    ap.add_argument("--iters-per-epoch", type=int, default=None)
    ap.add_argument("--cfg-options", nargs="+", default=None)
    ap.add_argument("--no-validate", action="store_true",
                    help="skip periodic evaluation during training "
                    "(reference --no-validate)")
    ap.add_argument("--deterministic", action="store_true",
                    help="bit-reproducible runs: single-threaded host RNG "
                    "seeding + deterministic XLA reductions "
                    "(reference --deterministic)")
    ap.add_argument(
        "--launcher", choices=["none", "jax"], default="none",
        help="'jax' = multi-host DDP: jax.distributed.initialize before mesh "
             "creation; each process feeds its local batch shard (reference "
             "mmcv init_dist, tools/train.py:136)",
    )
    args = ap.parse_args()

    if args.deterministic:
        # must be set before jax initializes: deterministic XLA op lowering
        # (reductions/scatters); host-side loaders are already seeded-stateless
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " --xla_gpu_deterministic_ops=true"
        ).strip()
        import random

        random.seed(args.seed)
        import numpy as np

        np.random.seed(args.seed)

    if args.launcher == "jax":
        from nuhtc_tpu.parallel.mesh import init_distributed

        nproc = init_distributed()
        print(f"distributed: {nproc} processes")

    from nuhtc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()  # train-graph compiles are minutes-scale

    import jax.numpy as jnp

    from nuhtc_tpu.config import Config
    from nuhtc_tpu.data import build_dataset
    from nuhtc_tpu.data.loader import PrefetchLoader
    from nuhtc_tpu.data.pipelines import build_train_pipeline
    from nuhtc_tpu.models.build import build_detector
    from nuhtc_tpu.train.trainer import Trainer

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_options(dict(kv.split("=", 1) for kv in args.cfg_options))

    work_dir = args.work_dir or cfg.get("work_dir") or (
        "./work_dirs/" + os.path.splitext(os.path.basename(args.config))[0]
    )

    train_ds = build_dataset(cfg.data.train)
    test_ds = None
    if "test" in cfg.data:
        try:
            test_ds = build_dataset({**cfg.data.test, "test_mode": True})
        except FileNotFoundError:
            pass
    pipeline = build_train_pipeline(cfg.get("train_pipeline", []))
    from nuhtc_tpu.data.loader import SemiDataset, SemiPrefetchLoader

    import jax

    # per-process distinct sampling stream (DistributedSampler analog:
    # samples_per_gpu is the LOCAL batch; shard_batch assembles the global)
    loader_seed = args.seed + jax.process_index() * 100003

    batch_size = cfg.get("samples_per_gpu", None) or cfg.get("data", {}).get(
        "samples_per_gpu", 8
    )
    if isinstance(train_ds, SemiDataset):
        loader = SemiPrefetchLoader(
            train_ds,
            pipeline,
            strong_pipeline=(
                build_train_pipeline(cfg["unsup_strong_pipeline"])
                if cfg.get("unsup_strong_pipeline")
                else None
            ),
            batch_size=batch_size,
            sup_ratio=cfg.get("sup_ratio", 0.5),
            seed=loader_seed,
        )
    else:
        loader = PrefetchLoader(
            train_ds,
            pipeline,
            batch_size=batch_size,
            seed=loader_seed,
        )

    import jax

    dtype = jnp.bfloat16 if jax.default_backend() not in ("cpu",) else jnp.float32
    model = build_detector(cfg.model, cfg.model.get("test_cfg"),
                           float(cfg.get("scale_factor", 2.0)), dtype=dtype)

    n_train = len(train_ds)
    iters_per_epoch = args.iters_per_epoch or max(n_train // batch_size, 1)
    # checkpoint_config = dict(interval=, max_keep_ckpts=) is the reference
    # schema (configs/nuhtc/*_seasaw_CAS.py:374-378); the flat
    # checkpoint_interval key is this framework's shorthand
    ckpt_cfg = cfg.get("checkpoint_config", {}) or {}
    trainer = Trainer(
        model,
        cfg,
        work_dir,
        max_epochs=args.max_epochs or cfg.get("max_epochs", 200),
        iters_per_epoch=iters_per_epoch,
        log_interval=cfg.get("log_interval", 50),
        checkpoint_interval=cfg.get(
            "checkpoint_interval", ckpt_cfg.get("interval", 10)
        ),
        max_keep_ckpts=ckpt_cfg.get("max_keep_ckpts", 40),
        eval_interval=cfg.get("evaluation", {}).get("interval", 10),
        seed=args.seed,
    )
    trainer.run(loader, None if args.no_validate else test_ds,
                resume_from=args.resume_from)


if __name__ == "__main__":
    main()
