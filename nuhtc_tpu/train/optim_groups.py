"""Named per-parameter optimizer groups (reference
nuhtc/utils/exts/optimizer_constructor.py:13 NamedOptimizerConstructor +
mmcv paramwise_cfg): build an optax.multi_transform from name-pattern rules.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import optax
from flax import traverse_util


def build_named_optimizer(
    params: Any,
    base_lr=1e-4,
    weight_decay: float = 0.05,
    rules: Sequence[Dict] = (),
    b1: float = 0.9,
    b2: float = 0.999,
):
    """rules: [{"pattern": "relative_position_bias_table", "lr_mult": 1.0,
    "decay_mult": 0.0}, ...] — first matching rule wins (mmcv custom_keys).

    ``base_lr`` may be a float OR an optax schedule — the trainer passes its
    warmup+step schedule so paramwise groups keep the full LR policy
    (Trainer routes here when optimizer.paramwise_cfg.custom_keys is set)."""

    def label_of(path: str) -> str:
        for i, rule in enumerate(rules):
            if rule["pattern"].lower() in path.lower():
                return f"rule{i}"
        return "default"

    flat = traverse_util.flatten_dict(params)
    labels = traverse_util.unflatten_dict(
        {k: label_of("/".join(map(str, k))) for k in flat}
    )

    def lr_of(mult: float):
        if callable(base_lr):
            return (lambda step, m=mult: base_lr(step) * m)
        return base_lr * mult

    transforms = {
        "default": optax.adamw(lr_of(1.0), b1=b1, b2=b2, weight_decay=weight_decay)
    }
    for i, rule in enumerate(rules):
        transforms[f"rule{i}"] = optax.adamw(
            lr_of(rule.get("lr_mult", 1.0)),
            b1=b1,
            b2=b2,
            weight_decay=weight_decay * rule.get("decay_mult", 1.0),
        )
    return optax.multi_transform(transforms, labels)
