"""Checkpointing: orbax save/load + torch ``.pth`` → flax converter.

Replaces the reference's mmcv CheckpointHook / load_checkpoint machinery
(reference nuhtc/apis/train.py:199-207, nuhtc/utils/patch.py:14-57) with
orbax, and provides a one-time converter for mmdet-trained NuHTC state dicts
(e.g. ``models/pannuke.pth``) into our NHWC/flax parameter tree.

Layout conventions converted:
- Conv2d  (O, I, kh, kw) → (kh, kw, I, O)
- Linear  (O, I)         → (I, O)
- ConvTranspose2d (I, O, kh, kw) → (kh, kw, I, O)  (2×2/stride-2 deconv)
- LayerNorm weight/bias  → scale/bias
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np


# --------------------------------------------------------------------------- #
# orbax
# --------------------------------------------------------------------------- #
def save_checkpoint(path: str, state: Any, step: Optional[int] = None, keep: int = 40):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    with ocp.CheckpointManager(
        path, options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True)
    ) as mgr:
        mgr.save(step if step is not None else 0, args=ocp.args.StandardSave(state))


def load_checkpoint(path: str, abstract_state: Any, step: Optional[int] = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.CheckpointManager(path) as mgr:
        step = step if step is not None else mgr.latest_step()
        return mgr.restore(step, args=ocp.args.StandardRestore(abstract_state))


def latest_step(path: str) -> Optional[int]:
    import orbax.checkpoint as ocp

    if not os.path.isdir(path):
        return None
    with ocp.CheckpointManager(os.path.abspath(path)) as mgr:
        return mgr.latest_step()


# --------------------------------------------------------------------------- #
# torch → flax conversion
# --------------------------------------------------------------------------- #
def _conv_w(w):  # (O, I, kh, kw) → (kh, kw, I, O)
    return np.transpose(w, (2, 3, 1, 0))


def _deconv_w(w):  # (I, O, kh, kw) → (kh, kw, I, O), spatially flipped:
    # torch conv_transpose2d ≡ flax ConvTranspose with a rot-180 kernel
    # (flax uses fractionally-strided conv WITHOUT mirroring; verified vs
    # torch in tests/test_heads_torch_parity.py::test_mask_head_matches_torch)
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def _lin_w(w):  # (O, I) → (I, O)
    return np.transpose(w)


def _roi_fc_w(w, roi_size: int = 7):
    """First fc over roi features: torch flattens (c, i, j) but our heads
    flatten (i, j, c) — the natural NHWC minor order, avoiding a per-step
    activation transpose (models/bbox_head.py). (O, C*S*S) → (S*S*C, O)
    with rows permuted accordingly."""
    o, cin = w.shape
    c = cin // (roi_size * roi_size)
    w = w.reshape(o, c, roi_size, roi_size)
    return np.ascontiguousarray(
        np.transpose(w, (2, 3, 1, 0)).reshape(cin, o)
    )


def map_torch_key(key: str) -> Optional[Tuple[Tuple[str, ...], Any]]:
    """mmdet NuHTC state-dict key → (flax path, transform fn). None = skip."""
    t_conv, t_deconv, t_lin, t_id = _conv_w, _deconv_w, _lin_w, lambda x: x

    def leaf(name):
        return {"weight": "kernel", "bias": "bias"}.get(name, name)

    def norm_leaf(name):
        return {"weight": "scale", "bias": "bias"}.get(name, name)

    parts = key.split(".")

    # ---- backbone ------------------------------------------------------
    if parts[0] == "backbone":
        if parts[1] == "patch_embed":
            if parts[2] == "projection":
                return ("backbone", "patch_embed", leaf(parts[3])), (
                    t_conv if parts[3] == "weight" else t_id
                )
            if parts[2] == "norm":
                return ("backbone", "patch_norm", norm_leaf(parts[3])), t_id
        if parts[1] == "stages":
            s, sub = int(parts[2]), parts[3]
            if sub == "blocks":
                b = int(parts[4])
                rest = parts[5:]
                base = ("backbone", f"stage{s}_block{b}")
                if rest[0] in ("norm1", "norm2"):
                    return base + (rest[0], norm_leaf(rest[1])), t_id
                if rest[0] == "attn":
                    r = rest[1:]
                    if r[0] == "w_msa":
                        r = r[1:]
                    if r[0] == "relative_position_bias_table":
                        return base + ("attn", "relative_position_bias_table"), t_id
                    if r[0] == "relative_position_index":
                        return None
                    if r[0] in ("qkv", "proj"):
                        return base + ("attn", r[0], leaf(r[1])), (
                            t_lin if r[1] == "weight" else t_id
                        )
                if rest[0] == "ffn":
                    # mmdet FFN: layers.0.0 = fc1, layers.1 = fc2
                    if rest[1] == "layers":
                        which = "fc1" if rest[2] == "0" else "fc2"
                        lname = rest[4] if rest[2] == "0" else rest[3]
                        return base + ("ffn", which, leaf(lname)), (
                            t_lin if lname == "weight" else t_id
                        )
            if sub == "downsample":
                base = ("backbone", f"downsample{s}")
                if parts[4] == "norm":
                    return base + ("norm", norm_leaf(parts[5])), t_id
                if parts[4] == "reduction":
                    return base + ("reduction", "kernel"), t_lin
        m = re.fullmatch(r"norm(\d)", parts[1])
        if m:
            return ("backbone", f"out_norm{m.group(1)}", norm_leaf(parts[2])), t_id

    # ---- neck ----------------------------------------------------------
    if parts[0] == "neck":
        i = int(parts[2])
        which = "lateral" if parts[1] == "lateral_convs" else "fpn"
        return ("neck", f"{which}{i}", leaf(parts[4])), (t_conv if parts[4] == "weight" else t_id)

    # ---- rpn -----------------------------------------------------------
    if parts[0] == "rpn_head":
        return ("rpn_head", parts[1], leaf(parts[2])), (t_conv if parts[2] == "weight" else t_id)

    # ---- roi head ------------------------------------------------------
    if parts[0] == "roi_head":
        sub = parts[1]
        if sub == "semantic_head":
            if parts[2] == "lateral_convs":
                return ("semantic_head", f"lateral{parts[3]}", leaf(parts[5])), (
                    t_conv if parts[5] == "weight" else t_id
                )
            if parts[2] == "convs":
                return ("semantic_head", f"conv{parts[3]}", leaf(parts[5])), (
                    t_conv if parts[5] == "weight" else t_id
                )
            if parts[2] == "conv_embedding":
                return ("semantic_head", "conv_embedding", leaf(parts[4])), (
                    t_conv if parts[4] == "weight" else t_id
                )
            if parts[2] == "conv_logits":
                return ("semantic_head", "conv_logits", leaf(parts[3])), (
                    t_conv if parts[3] == "weight" else t_id
                )
        if sub == "bbox_head":
            s = int(parts[2])
            base = ("bbox_heads_%d" % s,)
            if parts[3] == "shared_fcs":
                # fc0 consumes flattened roi features: permute torch's
                # (c, i, j) row order to our (i, j, c) convention
                t_fc = _roi_fc_w if parts[4] == "0" else t_lin
                return base + (f"shared_fc{parts[4]}", leaf(parts[5])), (
                    t_fc if parts[5] == "weight" else t_id
                )
            if parts[3] in ("fc_cls", "fc_reg"):
                return base + (parts[3], leaf(parts[4])), (t_lin if parts[4] == "weight" else t_id)
        if sub == "mask_head":
            rest = parts[3:] if parts[2].isdigit() else parts[2:]
            if rest[0] == "convs":
                return ("mask_head", f"conv{rest[1]}", leaf(rest[3])), (
                    t_conv if rest[3] == "weight" else t_id
                )
            if rest[0] == "conv_res":
                return ("mask_head", "conv_res", leaf(rest[2])), (
                    t_conv if rest[2] == "weight" else t_id
                )
            if rest[0] == "upsample":
                return ("mask_head", "upsample", leaf(rest[1])), (
                    t_deconv if rest[1] == "weight" else t_id
                )
            if rest[0] == "conv_logits":
                return ("mask_head", "conv_logits", leaf(rest[1])), (
                    t_conv if rest[1] == "weight" else t_id
                )
    return None


def convert_torch_state_dict(state_dict: Dict[str, np.ndarray], flax_params: Any) -> Any:
    """Map a torch state dict onto an existing flax param tree (shape-checked).

    Missing flax leaves keep their initialized values; unmatched torch keys
    are reported in the returned info dict.
    """
    from flax import traverse_util

    flat = traverse_util.flatten_dict(flax_params["params"])
    matched, missed = {}, []
    for k, v in state_dict.items():
        v = np.asarray(v)
        mapped = map_torch_key(k)
        if mapped is None:
            if not k.endswith("relative_position_index") and "num_batches_tracked" not in k:
                missed.append(k)
            continue
        path, fn = mapped
        if path not in flat:
            missed.append(k)
            continue
        w = fn(v)
        if flat[path].shape != w.shape:
            raise ValueError(f"shape mismatch for {k} → {path}: {flat[path].shape} vs {w.shape}")
        matched[path] = w.astype(np.asarray(flat[path]).dtype)
    out = dict(flat)
    out.update(matched)
    info = dict(
        matched=len(matched),
        unmatched_torch=missed,
        uninitialized=[p for p in flat if p not in matched],
    )
    return {"params": traverse_util.unflatten_dict(out)}, info


def load_torch_checkpoint(path: str, flax_params: Any):
    import torch

    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}
    return convert_torch_state_dict(sd, flax_params)
