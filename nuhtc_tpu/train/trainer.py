"""Epoch-based training loop (the mmcv EpochBasedRunner equivalent).

Covers the reference train path machinery (nuhtc/apis/train.py:45-208 +
hooks): data-parallel mesh, threaded host data loading, periodic text/json
logging (mmcv TextLoggerHook analog), orbax checkpointing with max_keep
(CheckpointHook), EMA weights, auto-resume, and a periodic eval hook that
runs dataset.evaluate on the test split.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict, Optional

import numpy as np

from nuhtc_tpu.utils.logging import get_root_logger


class Trainer:
    def __init__(
        self,
        model,
        cfg,
        work_dir: str,
        max_epochs: int = 200,
        iters_per_epoch: int = 1000,
        log_interval: int = 50,
        checkpoint_interval: int = 10,
        eval_interval: int = 10,
        max_keep_ckpts: int = 40,
        seed: int = 0,
    ):
        self.model = model
        self.cfg = cfg
        self.work_dir = work_dir
        self.max_epochs = max_epochs
        self.iters_per_epoch = iters_per_epoch
        self.log_interval = log_interval
        self.checkpoint_interval = checkpoint_interval
        self.eval_interval = eval_interval
        self.max_keep_ckpts = max_keep_ckpts
        self.seed = seed
        os.makedirs(work_dir, exist_ok=True)
        self.logger = get_root_logger(os.path.join(work_dir, "train.log"))
        self.json_log = open(os.path.join(work_dir, "log.json"), "a")

    def run(self, loader, test_dataset=None, resume_from: Optional[str] = None):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from nuhtc_tpu.parallel.mesh import make_mesh, shard_batch, replicate
        from nuhtc_tpu.train.train_state import (
            TrainState,
            create_semi_train_state,
            create_train_state,
            lr_schedule,
            make_semi_train_step,
            make_train_step,
        )
        from nuhtc_tpu.utils import checkpoint as ckpt
        from nuhtc_tpu.utils.hooks import WeightSummary, build_weighter

        model = self.model
        mesh = make_mesh()
        n_dev = len(mesh.devices.ravel())
        self.logger.info(f"devices: {n_dev} ({jax.default_backend()})")

        # init params
        batch0 = next(iter(loader))
        img0 = jnp.zeros((1,) + batch0["img"].shape[1:], jnp.float32)
        params = model.init(jax.random.PRNGKey(self.seed), img0, method="init_forward")
        if self.cfg.get("weight_summary", True):
            WeightSummary()(params, self.logger)  # reference weights_summary.py:62
        else:
            n_params = sum(np.prod(x.shape) for x in jax.tree.leaves(params))
            self.logger.info(f"params: {n_params / 1e6:.2f}M")

        schedule = lr_schedule(
            base_lr=self.cfg.get("optimizer", {}).get("lr", 1e-4),
            warmup_iters=self.cfg.get("lr_config", {}).get("warmup_iters", 1000),
            step_epochs=tuple(self.cfg.get("lr_config", {}).get("step", [30, 160])),
            iters_per_epoch=self.iters_per_epoch,
        )
        # scheduled loss re-weighting (reference Weighter hook,
        # nuhtc/utils/hooks/weight_adjust.py:7) — applied inside the jit
        # loss so it shapes gradients, not just the logged numbers
        weighter = build_weighter(self.cfg.get("loss_weight_schedules"))

        # reference-style custom_hooks entries map onto our flat cfg keys
        # (config :395-401: LinearMomentumEMAHook momentum, FineTune iter)
        ema_momentum = self.cfg.get("ema", {}).get("momentum")
        finetune_iter = self.cfg.get("finetune_iter")
        teacher_momentum = None
        for hk in self.cfg.get("custom_hooks") or []:
            t = str(hk.get("type", ""))
            if t == "LinearMomentumEMAHook" and ema_momentum is None:
                ema_momentum = hk.get("momentum")
            if t == "MeanTeacher" and teacher_momentum is None:
                # the MeanTeacher hook carries ITS OWN momentum (reference
                # mean_teacher.py:8) — do not conflate with the eval-EMA hook
                teacher_momentum = hk.get("momentum")
            if t == "FineTune" and finetune_iter is None:
                finetune_iter = hk.get("iter")
        if finetune_iter is None:
            finetune_iter = 15000

        # reference NamedOptimizerConstructor paramwise groups (mmcv
        # custom_keys) route through build_named_optimizer with the SAME
        # warmup+step schedule; without custom_keys, create_optimizer's
        # decay_mask already encodes the reference Swin no-decay keys.
        # Built BEFORE the semi/supervised split so semi runs honor
        # custom_keys too (advisor finding, round 2).
        custom_keys = (
            self.cfg.get("optimizer", {})
            .get("paramwise_cfg", {})
            .get("custom_keys")
        )
        named_tx = None
        if custom_keys:
            from nuhtc_tpu.train.optim_groups import build_named_optimizer

            rules = [
                dict(pattern=k, **v) for k, v in dict(custom_keys).items()
            ]
            named_tx = build_named_optimizer(
                params, base_lr=schedule,
                weight_decay=self.cfg.get("optimizer", {}).get("weight_decay", 0.05),
                rules=rules,
            )

        semi_cfg = self.cfg.get("semi_wrapper")
        if semi_cfg:
            from nuhtc_tpu.models.semi import MultiStreamDetector

            wrapper = MultiStreamDetector(
                model,
                score_thr=semi_cfg.get("score_thr", 0.9),
                max_gt=semi_cfg.get("max_gt", 128),
            )
            state, tx = create_semi_train_state(
                model, params,
                num_stages=getattr(model, "num_stages", 1),
                num_classes=model.num_classes,
                schedule=schedule,
                tx=named_tx,
            )
            train_step = make_semi_train_step(
                wrapper, tx,
                teacher_momentum=(
                    semi_cfg.get("momentum")
                    or teacher_momentum
                    or 0.999
                ),
                teacher_warmup=semi_cfg.get("warm_up", 100),
                unsup_weight=semi_cfg.get("unsup_weight", 1.0),
                burn_in=semi_cfg.get("burn_in", 0),
                finetune_iter=finetune_iter,
                weighter=weighter,
            )
        else:
            state, tx = create_train_state(
                model, params,
                num_stages=getattr(model, "num_stages", 1),  # MaskRCNN has one stage
                num_classes=model.num_classes,
                schedule=schedule,
                tx=named_tx,
            )
            train_step = make_train_step(
                model, tx,
                ema_momentum=2e-4 if ema_momentum is None else ema_momentum,
                finetune_iter=finetune_iter,
                weighter=weighter,
            )

        ckpt_dir = os.path.join(os.path.abspath(self.work_dir), "checkpoints")
        start_epoch = 0
        if resume_from:
            step = ckpt.latest_step(resume_from)
            if step is None:
                # an EXPLICIT resume path with nothing loadable is an error —
                # silently restarting from scratch could overwrite a run
                raise FileNotFoundError(
                    f"--resume-from {resume_from!r}: no loadable checkpoint found"
                )
            state = ckpt.load_checkpoint(resume_from, state, step)
            start_epoch = int(step)
            self.logger.info(f"resumed from epoch {start_epoch}")
        elif os.path.isdir(ckpt_dir) and ckpt.latest_step(ckpt_dir) is not None:
            step = ckpt.latest_step(ckpt_dir)
            state = ckpt.load_checkpoint(ckpt_dir, state, step)
            start_epoch = int(step)
            self.logger.info(f"auto-resumed from epoch {start_epoch}")

        state = replicate(state, mesh)
        rng = replicate(jax.random.PRNGKey(self.seed + 1), mesh)
        jit_step = jax.jit(
            train_step,
            in_shardings=(
                NamedSharding(mesh, P()),
                NamedSharding(mesh, P("data")),
                NamedSharding(mesh, P()),
            ),
            out_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P())),
            # NOTE: buffer donation is rejected by the axon TPU backend
        )

        # periodic prediction-overlay rendering (reference MaskVisHook,
        # nuhtc/utils/hooks/mask_vis_hook.py:187). Configured either via a
        # ``mask_vis`` dict or a reference-style ``custom_hooks`` entry
        # (dict(type='Mask_Vis_Hook', interval=N), reference config :395-401)
        vis_hook = None
        vis_cfg = self.cfg.get("mask_vis")
        if vis_cfg is None:
            for h in self.cfg.get("custom_hooks") or []:
                if str(h.get("type", "")).lower().replace("_", "") == "maskvishook":
                    vis_cfg = {k: v for k, v in h.items() if k != "type"}
        if vis_cfg and test_dataset is not None:
            from nuhtc_tpu.apis.inference import InferenceEngine
            from nuhtc_tpu.utils.hooks import MaskVisHook
            from nuhtc_tpu.utils.logging import MetricLogger

            self.metric_logger = MetricLogger(os.path.join(self.work_dir, "tf_logs"))
            vis_hook = MaskVisHook(
                lambda p: InferenceEngine(self.model, p, batch_size=2),
                test_dataset,
                self.metric_logger,
                interval=vis_cfg.get("interval", 2000),
                num_images=vis_cfg.get("num_images", 2),
            )

        it = iter(loader)
        t_start = time.time()
        for epoch in range(start_epoch, self.max_epochs):
            for i in range(self.iters_per_epoch):
                batch = shard_batch(next(it), mesh)
                state, metrics = jit_step(state, batch, rng)
                gstep = epoch * self.iters_per_epoch + i
                if (i + 1) % self.log_interval == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    lr = float(schedule(gstep))
                    msg = (
                        f"Epoch [{epoch + 1}][{i + 1}/{self.iters_per_epoch}] "
                        f"lr: {lr:.2e} total: {m['total']:.4f} "
                        + " ".join(f"{k}: {v:.4f}" for k, v in m.items() if k != "total")
                    )
                    self.logger.info(msg)
                    self.json_log.write(
                        json.dumps(
                            {"mode": "train", "epoch": epoch + 1, "iter": i + 1,
                             "lr": lr, **m}
                        ) + "\n"
                    )
                    self.json_log.flush()
                if vis_hook is not None and gstep and gstep % vis_hook.interval == 0:
                    try:
                        trees = self._eval_submodules(state)
                        name, p = next(iter(trees.items()))
                        vis_hook.maybe_log(gstep, jax.device_get(p))
                    except Exception as e:  # vis must not kill training
                        self.logger.warning(f"mask_vis failed: {e}")
            if (epoch + 1) % self.checkpoint_interval == 0 or epoch + 1 == self.max_epochs:
                host_state = jax.device_get(state)
                ckpt.save_checkpoint(ckpt_dir, host_state, step=epoch + 1, keep=self.max_keep_ckpts)
                self.logger.info(f"saved checkpoint @ epoch {epoch + 1}")
            if test_dataset is not None and (epoch + 1) % self.eval_interval == 0:
                for name, p in self._eval_submodules(state).items():
                    try:
                        self._evaluate(
                            test_dataset, jax.device_get(p), tag=name,
                            epoch=epoch + 1,
                        )
                    except Exception as e:  # eval must not kill training
                        self.logger.warning(f"eval[{name}] failed: {e}")
        self.logger.info(f"training done in {(time.time() - t_start) / 3600:.2f}h")
        return state

    def _eval_submodules(self, state) -> Dict[str, Any]:
        """Which parameter trees to evaluate — the SubModulesDistEvalHook
        analog (reference nuhtc/utils/hooks/submodules_evaluation.py:11-80:
        semi-supervised runs switch ``inference_on`` across teacher/student
        and evaluate each). Here submodules are parameter trees over one
        functional model: teacher/student for semi states, EMA by default.
        Select with cfg key ``evaluated_modules`` (list of names)."""
        avail: Dict[str, Any] = {}
        for field, name in (
            ("teacher_params", "teacher"),
            ("student_params", "student"),
            ("ema_params", "ema"),
            ("params", "raw"),
        ):
            if hasattr(state, field):
                avail[name] = getattr(state, field)
        wanted = self.cfg.get("evaluated_modules")
        if wanted:
            sel = {n: avail[n] for n in wanted if avail.get(n) is not None}
            missing = [n for n in wanted if avail.get(n) is None]
            if missing:
                self.logger.warning(
                    f"evaluated_modules {missing} not on this train state "
                    f"(available: {sorted(avail)}); "
                    + ("evaluating the rest" if sel else "falling back to defaults")
                )
            if sel:
                return sel
        if "teacher" in avail:  # semi runs evaluate both streams by default
            return {"teacher": avail["teacher"], "student": avail["student"]}
        default = avail.get("ema")
        if default is None:  # ema field may exist but be disabled (None)
            default = avail.get("raw")
        if default is None:
            self.logger.warning(
                "no evaluable parameter tree on this train state "
                f"(available fields: {sorted(avail)}); skipping eval"
            )
            return {}
        return {"ema": default}

    def _evaluate(self, dataset, params, limit: int = 256, tag: str = "ema",
                  epoch: int | None = None):
        from nuhtc_tpu.apis.inference import InferenceEngine
        from nuhtc_tpu.eval.evaluate import evaluate_dataset
        from nuhtc_tpu.ops import rle as rle_ops

        engine = InferenceEngine(self.model, params, batch_size=8)
        n = min(len(dataset), limit)
        results = []
        for s in range(0, n, engine.batch_size):
            imgs = [dataset.load_image(i) for i in range(s, min(s + engine.batch_size, n))]
            for res in engine.run_batch(imgs):
                bboxes, segms = engine.to_reference_format(res)
                segms = [[rle_ops.encode(m) for m in cls_masks] for cls_masks in segms]
                results.append((bboxes, segms))

        class _Sliced:
            def __init__(s2, ds, k):
                s2._ds, s2._k = ds, k

            def __len__(s2):
                return s2._k

            def __getattr__(s2, a):
                return getattr(s2._ds, a)

        metrics = evaluate_dataset(_Sliced(dataset, n), results)
        self.logger.info(
            f"eval[{tag}]: " + " ".join(
                f"{k}: {v:.4f}" for k, v in metrics.items() if isinstance(v, float)
            )
        )
        # val rows in the json log (mode=val) — analyze_logs plots per-epoch
        # metric curves from these (reference analyze_wsi_logs plot_curve)
        if epoch is not None:
            self.json_log.write(
                json.dumps(
                    {"mode": "val", "epoch": epoch, "tag": tag,
                     **{k: float(v) for k, v in metrics.items()
                        if isinstance(v, (int, float))}}
                ) + "\n"
            )
            self.json_log.flush()
        return metrics
