"""Root logger + metric logging (reference nuhtc/utils/logger.py analog).

wandb is gated (absent in this environment); tensorboardX and a jsonl file
serve as the default sinks.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

try:
    import wandb  # type: ignore

    HAS_WANDB = True
except ImportError:
    wandb = None
    HAS_WANDB = False

_loggers = {}


def get_root_logger(log_file: Optional[str] = None, level=logging.INFO) -> logging.Logger:
    name = "nuhtc_tpu"
    if name in _loggers:
        return _loggers[name]
    logger = logging.getLogger(name)
    logger.setLevel(level)
    fmt = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.propagate = False
    _loggers[name] = logger
    return logger


class MetricLogger:
    """Scalar/image sink: tensorboardX + optional wandb."""

    def __init__(self, log_dir: str, use_wandb: bool = False, wandb_kwargs=None):
        self.tb = None
        try:
            from tensorboardX import SummaryWriter

            self.tb = SummaryWriter(log_dir)
        except ImportError:
            pass
        self.wandb_run = None
        if use_wandb and HAS_WANDB:
            self.wandb_run = wandb.init(**(wandb_kwargs or {}))

    def log_scalars(self, scalars: dict, step: int):
        if self.tb:
            for k, v in scalars.items():
                self.tb.add_scalar(k, v, step)
        if self.wandb_run:
            wandb.log(scalars, step=step)

    def log_image(self, tag: str, img, step: int):
        if self.tb:
            self.tb.add_image(tag, img, step, dataformats="HWC")
        if self.wandb_run:
            wandb.log({tag: wandb.Image(img)}, step=step)

    def close(self):
        if self.tb:
            self.tb.close()
        if self.wandb_run:
            self.wandb_run.finish()
