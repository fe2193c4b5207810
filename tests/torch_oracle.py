"""Torch/numpy oracle of the FULL NuHTC inference graph at arbitrary scale.

Generalizes the piecewise oracles proven in test_swin_torch_parity.py /
test_composed_torch_parity.py / test_ops_morphology_components.py to the real
architecture (Swin-T 96/[2,2,6,2], 64-ch FPN, 3 cascade stages, watershed
proposals ON, 512x512 input) so tools/misc/full_scale_parity.py can mint
end-to-end goldens on the reference demo images — the stand-in for the PQ
gate until a reference checkpoint exists (VERDICT round-2 #2).

Reference semantics oracled here (file:line in /root/reference):
- Swin: thirdparty mmdet swin.py WindowMSA :15-123, ShiftWindowMSA :126-260,
  SwinBlock :263-341, PatchMerging (nn.Unfold channel order)
- RPN: mmdet rpn_head.py get_bboxes (per-level top-k, delta decode, min-size
  filter, level-separated NMS)
- watershed proposals: nuhtc/models/htc_roi_head_cus.py:284-342 — in the
  shipped config (seg_head=None, thres=0) the scipy-EDT+watershed pipeline
  degenerates to connected components of the opened hole-filled mask
  (see nuhtc_tpu/ops/components.py:1-24 for the proof)
- cascade + NMS: htc_roi_head_cus.py:2184-2377 (Lite simple_test),
  nuhtc/models/bbox_head.py:12-102 (multiclass NMS w/ prob vectors),
  roi_extractors_cus.py:216-245 (attention RoI), seesaw activation
  (mmdet seesaw_loss.py:157-175), fcn/htc mask head :179-344.

Everything runs in torch/numpy f32 — fully independent of the JAX graph.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import scipy.ndimage as ndi
import torch
import torch.nn.functional as F

from nuhtc_tpu.models.detector import STAGE_STDS
from nuhtc_tpu.ops.anchors import grid_anchors


@dataclasses.dataclass
class OracleArch:
    # backbone (Swin-T defaults = configs/nuhtc/htc_lite_swin_fpn_pannuke.py)
    embed_dims: int = 96
    depths: tuple = (2, 2, 6, 2)
    num_heads: tuple = (3, 6, 12, 24)
    window: int = 7
    mlp_ratio: int = 4
    # neck / heads
    fpn_c: int = 64
    fc: int = 256
    nc: int = 5
    strides: tuple = (4, 8, 16, 32)
    anchor_ratios: tuple = (0.5, 1.0, 2.0)
    anchor_scales: tuple = (4,)
    # test cfg
    img_hw: int = 512
    nms_pre: int = 3000
    rpn_max: int = 1000
    rpn_iou: float = 0.7
    min_bs: float = 10.0
    score_thr: float = 0.05
    rcnn_iou: float = 0.5
    max_det: int = 500
    cand: int = 2048
    attn_thres: float = 0.965926
    scale: float = 2.0
    num_stages: int = 3
    # watershed proposal branch
    watershed: bool = True
    ws_max: int = 512
    ws_min_area: int = 10

    @property
    def stage_dims(self):
        return tuple(self.embed_dims * 2 ** i for i in range(len(self.depths)))

    @property
    def sizes(self):
        return [(self.img_hw // s, self.img_hw // s) for s in self.strides]


# --------------------------------------------------------------------- #
# random reference-format state dict
# --------------------------------------------------------------------- #

def build_full_sd(rng: np.random.RandomState, a: OracleArch) -> dict:
    t = lambda *s: torch.tensor(rng.randn(*s).astype(np.float32) * 0.1)
    sd = {}
    c0 = a.embed_dims
    sd["backbone.patch_embed.projection.weight"] = t(c0, 3, 4, 4)
    sd["backbone.patch_embed.projection.bias"] = t(c0)
    sd["backbone.patch_embed.norm.weight"] = t(c0) + 1.0
    sd["backbone.patch_embed.norm.bias"] = t(c0)
    for st, (depth, dim, nh) in enumerate(zip(a.depths, a.stage_dims, a.num_heads)):
        for bi in range(depth):
            p = f"backbone.stages.{st}.blocks.{bi}"
            sd.update({
                f"{p}.norm1.weight": t(dim) + 1.0,
                f"{p}.norm1.bias": t(dim),
                f"{p}.norm2.weight": t(dim) + 1.0,
                f"{p}.norm2.bias": t(dim),
                f"{p}.attn.w_msa.qkv.weight": t(3 * dim, dim),
                f"{p}.attn.w_msa.qkv.bias": t(3 * dim),
                f"{p}.attn.w_msa.proj.weight": t(dim, dim),
                f"{p}.attn.w_msa.proj.bias": t(dim),
                f"{p}.attn.w_msa.relative_position_bias_table":
                    t((2 * a.window - 1) ** 2, nh),
                f"{p}.ffn.layers.0.0.weight": t(a.mlp_ratio * dim, dim),
                f"{p}.ffn.layers.0.0.bias": t(a.mlp_ratio * dim),
                f"{p}.ffn.layers.1.weight": t(dim, a.mlp_ratio * dim),
                f"{p}.ffn.layers.1.bias": t(dim),
            })
        sd[f"backbone.norm{st}.weight"] = t(dim) + 1.0
        sd[f"backbone.norm{st}.bias"] = t(dim)
        if st < len(a.depths) - 1:
            sd[f"backbone.stages.{st}.downsample.norm.weight"] = t(4 * dim) + 1.0
            sd[f"backbone.stages.{st}.downsample.norm.bias"] = t(4 * dim)
            sd[f"backbone.stages.{st}.downsample.reduction.weight"] = t(2 * dim, 4 * dim)

    for i, c in enumerate(a.stage_dims):
        sd[f"neck.lateral_convs.{i}.conv.weight"] = t(a.fpn_c, c, 1, 1)
        sd[f"neck.lateral_convs.{i}.conv.bias"] = t(a.fpn_c)
        sd[f"neck.fpn_convs.{i}.conv.weight"] = t(a.fpn_c, a.fpn_c, 3, 3)
        sd[f"neck.fpn_convs.{i}.conv.bias"] = t(a.fpn_c)
    na = len(a.anchor_ratios) * len(a.anchor_scales)
    sd["rpn_head.rpn_conv.weight"] = t(a.fpn_c, a.fpn_c, 3, 3)
    sd["rpn_head.rpn_conv.bias"] = t(a.fpn_c)
    sd["rpn_head.rpn_cls.weight"] = t(na, a.fpn_c, 1, 1)
    sd["rpn_head.rpn_cls.bias"] = t(na)
    sd["rpn_head.rpn_reg.weight"] = t(na * 4, a.fpn_c, 1, 1) * 0.1
    sd["rpn_head.rpn_reg.bias"] = t(na * 4) * 0.1
    for i in range(4):
        sd[f"roi_head.semantic_head.lateral_convs.{i}.conv.weight"] = t(a.fpn_c, a.fpn_c, 1, 1)
        sd[f"roi_head.semantic_head.lateral_convs.{i}.conv.bias"] = t(a.fpn_c)
        sd[f"roi_head.semantic_head.convs.{i}.conv.weight"] = t(a.fpn_c, a.fpn_c, 3, 3)
        sd[f"roi_head.semantic_head.convs.{i}.conv.bias"] = t(a.fpn_c)
    sd["roi_head.semantic_head.conv_embedding.conv.weight"] = t(a.fpn_c, a.fpn_c, 1, 1)
    sd["roi_head.semantic_head.conv_embedding.conv.bias"] = t(a.fpn_c)
    sd["roi_head.semantic_head.conv_logits.weight"] = t(1, a.fpn_c, 1, 1)
    sd["roi_head.semantic_head.conv_logits.bias"] = t(1)
    for s in range(a.num_stages):
        sd[f"roi_head.bbox_head.{s}.shared_fcs.0.weight"] = t(a.fc, a.fpn_c * 49)
        sd[f"roi_head.bbox_head.{s}.shared_fcs.0.bias"] = t(a.fc)
        sd[f"roi_head.bbox_head.{s}.shared_fcs.1.weight"] = t(a.fc, a.fc)
        sd[f"roi_head.bbox_head.{s}.shared_fcs.1.bias"] = t(a.fc)
        sd[f"roi_head.bbox_head.{s}.fc_cls.weight"] = t(a.nc + 2, a.fc)
        sd[f"roi_head.bbox_head.{s}.fc_cls.bias"] = t(a.nc + 2)
        # small regression weights: random-weight deltas otherwise push
        # proposals out of frame, where max_shape clipping collapses them to
        # zero-area boxes (which dominate NMS survivors — IoU 0 vs anything)
        sd[f"roi_head.bbox_head.{s}.fc_reg.weight"] = t(4, a.fc) * 0.02
        sd[f"roi_head.bbox_head.{s}.fc_reg.bias"] = t(4) * 0.02
    for i in range(4):
        sd[f"roi_head.mask_head.convs.{i}.conv.weight"] = t(a.fpn_c, a.fpn_c, 3, 3)
        sd[f"roi_head.mask_head.convs.{i}.conv.bias"] = t(a.fpn_c)
    sd["roi_head.mask_head.upsample.weight"] = t(a.fpn_c, a.fpn_c, 2, 2)
    sd["roi_head.mask_head.upsample.bias"] = t(a.fpn_c)
    sd["roi_head.mask_head.conv_logits.weight"] = t(1, a.fpn_c, 1, 1)
    sd["roi_head.mask_head.conv_logits.bias"] = t(1)
    return sd


# --------------------------------------------------------------------- #
# Swin backbone (mmdet semantics)
# --------------------------------------------------------------------- #

def _rel_index_mmdet(ws):
    seq = (torch.arange(ws)[:, None] * (2 * ws - 1) + torch.arange(ws)[None, :]).reshape(1, -1)
    return (seq + seq.T).flip(1).contiguous()


def _window_attn(wins, sd, p, nh, ws, mask=None):
    bw, n, c = wins.shape
    hd = c // nh
    qkv = F.linear(wins, sd[f"{p}.attn.w_msa.qkv.weight"], sd[f"{p}.attn.w_msa.qkv.bias"])
    qkv = qkv.reshape(bw, n, 3, nh, hd).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q * hd ** -0.5) @ k.transpose(-2, -1)
    table = sd[f"{p}.attn.w_msa.relative_position_bias_table"]
    idx = _rel_index_mmdet(ws)
    bias = table[idx.reshape(-1)].reshape(n, n, nh).permute(2, 0, 1)
    attn = attn + bias[None]
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.view(bw // nw, nw, nh, n, n) + mask[None, :, None]
        attn = attn.view(bw, nh, n, n)
    attn = attn.softmax(dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(bw, n, c)
    return F.linear(out, sd[f"{p}.attn.w_msa.proj.weight"], sd[f"{p}.attn.w_msa.proj.bias"])


def _swin_block(x, sd, p, nh, ws, shift):
    b, h, w, c = x.shape
    shortcut = x
    y = F.layer_norm(x, (c,), sd[f"{p}.norm1.weight"], sd[f"{p}.norm1.bias"], eps=1e-5)
    pb, pr = (-h) % ws, (-w) % ws
    y = F.pad(y, (0, 0, 0, pr, 0, pb))
    hp, wp = h + pb, w + pr
    s = ws // 2 if shift else 0
    if s:
        y = torch.roll(y, (-s, -s), dims=(1, 2))
        img_mask = torch.zeros(hp, wp)
        cnt = 0
        for hs in (slice(0, -ws), slice(-ws, -s), slice(-s, None)):
            for wss in (slice(0, -ws), slice(-ws, -s), slice(-s, None)):
                img_mask[hs, wss] = cnt
                cnt += 1
        m = img_mask.view(hp // ws, ws, wp // ws, ws).permute(0, 2, 1, 3).reshape(-1, ws * ws)
        mask = torch.where(m[:, :, None] != m[:, None, :], -100.0, 0.0)
    else:
        mask = None
    wins = (y.view(b, hp // ws, ws, wp // ws, ws, c)
            .permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c))
    wins = _window_attn(wins, sd, p, nh, ws, mask)
    y = (wins.view(b, hp // ws, wp // ws, ws, ws, c)
         .permute(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c))
    if s:
        y = torch.roll(y, (s, s), dims=(1, 2))
    x = shortcut + y[:, :h, :w, :]
    z = F.layer_norm(x, (c,), sd[f"{p}.norm2.weight"], sd[f"{p}.norm2.bias"], eps=1e-5)
    z = F.linear(z, sd[f"{p}.ffn.layers.0.0.weight"], sd[f"{p}.ffn.layers.0.0.bias"])
    z = F.gelu(z)
    z = F.linear(z, sd[f"{p}.ffn.layers.1.weight"], sd[f"{p}.ffn.layers.1.bias"])
    return x + z


def _patch_merge(x, sd, p):
    x_t = x.permute(0, 3, 1, 2)
    x_t = F.pad(x_t, (0, x_t.shape[3] % 2, 0, x_t.shape[2] % 2))
    unf = F.unfold(x_t, kernel_size=2, stride=2)
    h2, w2 = x_t.shape[2] // 2, x_t.shape[3] // 2
    c4 = unf.shape[1]
    y = unf.transpose(1, 2)
    y = F.layer_norm(y, (c4,), sd[f"{p}.norm.weight"], sd[f"{p}.norm.bias"], eps=1e-5)
    y = F.linear(y, sd[f"{p}.reduction.weight"])
    return y.reshape(x.shape[0], h2, w2, c4 // 2)


def oracle_backbone(sd, img_nhwc: np.ndarray, a: OracleArch):
    """img (B, H, W, 3) normalized float → list of 4 NHWC torch features."""
    x = F.conv2d(torch.from_numpy(img_nhwc).permute(0, 3, 1, 2),
                 sd["backbone.patch_embed.projection.weight"],
                 sd["backbone.patch_embed.projection.bias"], stride=4)
    x = x.permute(0, 2, 3, 1)
    x = F.layer_norm(x, (a.embed_dims,), sd["backbone.patch_embed.norm.weight"],
                     sd["backbone.patch_embed.norm.bias"], eps=1e-5)
    outs = []
    for st, depth in enumerate(a.depths):
        for bi in range(depth):
            x = _swin_block(x, sd, f"backbone.stages.{st}.blocks.{bi}",
                            a.num_heads[st], a.window, shift=(bi % 2 == 1))
        out = F.layer_norm(x, (x.shape[-1],), sd[f"backbone.norm{st}.weight"],
                           sd[f"backbone.norm{st}.bias"], eps=1e-5)
        outs.append(out)
        if st < len(a.depths) - 1:
            x = _patch_merge(x, sd, f"backbone.stages.{st}.downsample")
    return outs


# --------------------------------------------------------------------- #
# FPN / RPN / semantic
# --------------------------------------------------------------------- #

def oracle_fpn(sd, bb_feats_nchw):
    lat = [F.conv2d(f, sd[f"neck.lateral_convs.{i}.conv.weight"],
                    sd[f"neck.lateral_convs.{i}.conv.bias"])
           for i, f in enumerate(bb_feats_nchw)]
    for i in range(len(lat) - 1, 0, -1):
        lat[i - 1] = lat[i - 1] + F.interpolate(lat[i], scale_factor=2, mode="nearest")
    return [F.conv2d(l, sd[f"neck.fpn_convs.{i}.conv.weight"],
                     sd[f"neck.fpn_convs.{i}.conv.bias"], padding=1)
            for i, l in enumerate(lat)]


def greedy_nms_score_order(boxes, scores, thr):
    order = np.argsort(-scores, kind="stable")
    keep, suppressed = [], np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        a2 = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / np.maximum(a1 + a2 - inter, 1e-10)
        suppressed |= iou > thr
        suppressed[i] = False
    return keep


def np_delta2bbox(anchors, deltas, means, stds, max_shape=None, wh_ratio_clip=16 / 1000):
    """mmdet delta_xywh_bbox_coder.delta2bbox."""
    means = np.asarray(means, np.float64)
    stds = np.asarray(stds, np.float64)
    d = deltas.astype(np.float64) * stds + means
    dx, dy, dw, dh = d[:, 0], d[:, 1], d[:, 2], d[:, 3]
    max_ratio = abs(np.log(wh_ratio_clip))
    dw = np.clip(dw, -max_ratio, max_ratio)
    dh = np.clip(dh, -max_ratio, max_ratio)
    px = (anchors[:, 0] + anchors[:, 2]) * 0.5
    py = (anchors[:, 1] + anchors[:, 3]) * 0.5
    pw = anchors[:, 2] - anchors[:, 0]
    ph = anchors[:, 3] - anchors[:, 1]
    gx = px + pw * dx
    gy = py + ph * dy
    gw = pw * np.exp(dw)
    gh = ph * np.exp(dh)
    x1, y1 = gx - gw * 0.5, gy - gh * 0.5
    x2, y2 = gx + gw * 0.5, gy + gh * 0.5
    out = np.stack([x1, y1, x2, y2], axis=1)
    if max_shape is not None:
        out[:, 0::2] = np.clip(out[:, 0::2], 0, max_shape[1])
        out[:, 1::2] = np.clip(out[:, 1::2], 0, max_shape[0])
    return out.astype(np.float32)


def oracle_rpn_proposals(sd, feats, a: OracleArch):
    cls_out, reg_out = [], []
    for f in feats:
        h = F.relu(F.conv2d(f, sd["rpn_head.rpn_conv.weight"],
                            sd["rpn_head.rpn_conv.bias"], padding=1))
        cls_out.append(F.conv2d(h, sd["rpn_head.rpn_cls.weight"], sd["rpn_head.rpn_cls.bias"]))
        reg_out.append(F.conv2d(h, sd["rpn_head.rpn_reg.weight"], sd["rpn_head.rpn_reg.bias"]))
    anchors = grid_anchors(a.sizes, a.strides, a.anchor_scales, a.anchor_ratios)
    all_boxes, all_scores, all_ids = [], [], []
    for lvl in range(len(feats)):
        scores = torch.sigmoid(cls_out[lvl][0]).permute(1, 2, 0).reshape(-1).numpy()
        deltas = reg_out[lvl][0].permute(1, 2, 0).reshape(-1, 4).numpy()
        anc = np.asarray(anchors[lvl])
        if a.nms_pre < len(scores):
            topk = np.argsort(-scores, kind="stable")[:a.nms_pre]
            scores, deltas, anc = scores[topk], deltas[topk], anc[topk]
        boxes = np_delta2bbox(anc, deltas, (0, 0, 0, 0), (1, 1, 1, 1),
                              max_shape=(a.img_hw, a.img_hw))
        all_boxes.append(boxes)
        all_scores.append(scores)
        all_ids.append(np.full(len(scores), lvl))
    boxes = np.concatenate(all_boxes)
    scores = np.concatenate(all_scores)
    ids = np.concatenate(all_ids)
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    ok = (w > a.min_bs) & (h > a.min_bs)
    boxes, scores, ids = boxes[ok], scores[ok], ids[ok]
    shifted = boxes + (ids * (float(a.img_hw) + 1.0))[:, None]
    keep = greedy_nms_score_order(shifted, scores, a.rpn_iou)[:a.rpn_max]
    return boxes[keep], scores[keep]


def oracle_semantic(sd, feats):
    """→ (logits (H0, W0) np, embedding (C, H0, W0) np)."""
    lat = [F.relu(F.conv2d(feats[i],
                           sd[f"roi_head.semantic_head.lateral_convs.{i}.conv.weight"],
                           sd[f"roi_head.semantic_head.lateral_convs.{i}.conv.bias"]))
           for i in range(4)]
    fused = lat[0]
    for i in range(1, 4):
        fused = fused + F.interpolate(lat[i], size=fused.shape[2:], mode="bilinear",
                                      align_corners=True)
    x = fused
    for i in range(4):
        x = F.relu(F.conv2d(x, sd[f"roi_head.semantic_head.convs.{i}.conv.weight"],
                            sd[f"roi_head.semantic_head.convs.{i}.conv.bias"], padding=1))
    emb = F.relu(F.conv2d(x, sd["roi_head.semantic_head.conv_embedding.conv.weight"],
                          sd["roi_head.semantic_head.conv_embedding.conv.bias"]))
    logits = F.conv2d(x, sd["roi_head.semantic_head.conv_logits.weight"],
                      sd["roi_head.semantic_head.conv_logits.bias"])
    return logits[0, 0].numpy(), emb[0].numpy()


# --------------------------------------------------------------------- #
# watershed (component) proposals
# --------------------------------------------------------------------- #

def oracle_component_proposals(logits_hw: np.ndarray, img_shape, min_area=10, thres=0.0):
    """F.interpolate(align_corners=True) → torchvision-sigma gaussian blur
    (reflect pad) → threshold → open(5x5, 2 iters) → fill holes → 4-connected
    components → area-filtered boxes. Returns (K, 4) float32 boxes."""
    h, w = img_shape
    up = F.interpolate(torch.from_numpy(logits_hw)[None, None], size=(h, w),
                       mode="bilinear", align_corners=True)
    sigma = 0.3 * ((5 - 1) * 0.5 - 1) + 0.8
    half = (5 - 1) * 0.5
    xk = np.linspace(-half, half, 5)
    k1 = np.exp(-0.5 * (xk / sigma) ** 2)
    k1 /= k1.sum()
    kern = torch.tensor(np.outer(k1, k1).astype(np.float32))[None, None]
    blurred = F.conv2d(F.pad(up, (2, 2, 2, 2), mode="reflect"), kern)[0, 0].numpy()
    mask = blurred > thres
    m = torch.from_numpy(mask.astype(np.float32))[None, None]
    box = torch.ones((1, 1, 5, 5))
    for _ in range(2):  # erosion x2
        m = torch.clamp(F.conv2d(m, box, padding=2) - box.sum() + 1, 0, 1)
    for _ in range(2):  # dilation x2
        m = torch.clamp(F.conv2d(m, box, padding=2), 0, 1)
    mask = ndi.binary_fill_holes(m[0, 0].numpy() > 0.5)
    lab, n = ndi.label(mask)  # 4-connectivity
    boxes = []
    max_area = h * w / 4
    for li, comp in enumerate(ndi.find_objects(lab), start=1):
        ys, xs = comp
        area = int((lab[comp] == li).sum())
        if area > min_area and area < max_area:
            boxes.append([xs.start, ys.start, xs.stop, ys.stop])
    return np.asarray(boxes, np.float32).reshape(-1, 4)


# --------------------------------------------------------------------- #
# RoI features / cascade / NMS / mask
# --------------------------------------------------------------------- #

def _bilinear_gather(feat_chw, ys, xs):
    """Vectorized mmcv-RoIAlign bilinear samples. ys/xs flat → (C, P)."""
    c, h, w = feat_chw.shape
    valid = (ys >= -1.0) & (ys <= h) & (xs >= -1.0) & (xs <= w)
    y = np.clip(ys, 0.0, None)
    x = np.clip(xs, 0.0, None)
    y_low = y.astype(np.int64)
    x_low = x.astype(np.int64)
    y_cap = y_low >= h - 1
    x_cap = x_low >= w - 1
    y_low = np.where(y_cap, h - 1, y_low)
    x_low = np.where(x_cap, w - 1, x_low)
    y_eff = np.where(y_cap, y_low.astype(np.float64), y)
    x_eff = np.where(x_cap, x_low.astype(np.float64), x)
    y_high = np.where(y_cap, h - 1, np.minimum(y_low + 1, h - 1))
    x_high = np.where(x_cap, w - 1, np.minimum(x_low + 1, w - 1))
    ly = y_eff - y_low
    lx = x_eff - x_low
    hy, hx = 1.0 - ly, 1.0 - lx
    v = feat_chw.astype(np.float64)
    out = ((hy * hx)[None] * v[:, y_low, x_low]
           + (hy * lx)[None] * v[:, y_low, x_high]
           + (ly * hx)[None] * v[:, y_high, x_low]
           + (ly * lx)[None] * v[:, y_high, x_high])
    return np.where(valid[None], out, 0.0)


def roi_align_np(feat_chw, rois, spatial_scale, out_size, sampling_ratio,
                 chunk=256):
    """Vectorized equivalent of test_ops_roi_align.roi_align_ref (the scalar
    oracle is O(R*C*49*4) python calls — unusable at R≈1500, C=64). Verified
    equal in tests/test_full_scale_parity.py::test_roi_align_np_matches_scalar_ref."""
    c, h, w = feat_chw.shape
    n = len(rois)
    out = np.zeros((n, c, out_size, out_size), np.float64)
    sc = spatial_scale
    sw = rois[:, 0] * sc - 0.5
    sh = rois[:, 1] * sc - 0.5
    rw = rois[:, 2] * sc - 0.5 - sw
    rh = rois[:, 3] * sc - 0.5 - sh
    bw, bh = rw / out_size, rh / out_size
    if sampling_ratio > 0:
        gh = np.full(n, sampling_ratio, np.int64)
        gw = np.full(n, sampling_ratio, np.int64)
    else:
        gh = np.maximum(np.ceil(rh / out_size).astype(np.int64), 1)
        gw = np.maximum(np.ceil(rw / out_size).astype(np.int64), 1)
    groups = {}
    for i in range(n):
        groups.setdefault((int(gh[i]), int(gw[i])), []).append(i)
    pg = np.arange(out_size)
    for (g_h, g_w), idx_list in groups.items():
        for start in range(0, len(idx_list), chunk):
            idxs = np.asarray(idx_list[start:start + chunk])
            k = len(idxs)
            iy = (np.arange(g_h) + 0.5) / g_h
            ix = (np.arange(g_w) + 0.5) / g_w
            # (k, out, g): per-roi bin start + in-bin sample offset
            yy = (sh[idxs, None, None] + pg[None, :, None] * bh[idxs, None, None]
                  + iy[None, None, :] * bh[idxs, None, None])
            xx = (sw[idxs, None, None] + pg[None, :, None] * bw[idxs, None, None]
                  + ix[None, None, :] * bw[idxs, None, None])
            # full sample grid (k, ph, iy, pw, ix)
            Y = np.broadcast_to(yy[:, :, :, None, None],
                                (k, out_size, g_h, out_size, g_w))
            X = np.broadcast_to(xx[:, None, None, :, :],
                                (k, out_size, g_h, out_size, g_w))
            vals = _bilinear_gather(feat_chw, Y.ravel(), X.ravel())
            vals = vals.reshape(c, k, out_size, g_h, out_size, g_w)
            out[idxs] = vals.mean(axis=(3, 5)).transpose(1, 0, 2, 3)
    return out


def oracle_attention_pool(feat_chw, rois, stride, attn_thres):
    c, h, w = feat_chw.shape
    tf = torch.from_numpy(feat_chw)[None]
    trois = torch.from_numpy(rois.astype(np.float32))
    roi_x = torch.div((trois[:, 0] + trois[:, 2]), 2 * stride,
                      rounding_mode="floor").clamp(0, w - 1)
    roi_y = torch.div((trois[:, 1] + trois[:, 3]), 2 * stride,
                      rounding_mode="floor").clamp(0, h - 1)
    roi_vec = tf[0, :, roi_y.long(), roi_x.long()].T
    feat_vec = tf[0].permute(1, 2, 0).reshape(-1, c)
    outs = []
    for start in range(0, len(roi_vec), 256):  # bound the (R, H*W, C) intermediate
        rv = roi_vec[start:start + 256]
        sim = F.relu(F.cosine_similarity(rv.unsqueeze(1), feat_vec.unsqueeze(0), dim=2)
                     - attn_thres) + attn_thres
        sim = sim.view(-1, 1, h, w)
        outs.append(torch.mean(tf[0].unsqueeze(0) * sim, dim=(2, 3)))
    return torch.cat(outs).numpy()


def oracle_roi_feats(feats_chw, sem_chw, rois, out_size, sampling_ratio, a: OracleArch):
    r = len(rois)
    acc = np.zeros((r, a.fpn_c, out_size, out_size), np.float64)
    for lvl in range(4):
        if lvl < 2:
            acc += roi_align_np(feats_chw[lvl], rois, 1.0 / a.strides[lvl],
                                out_size, sampling_ratio)
        else:
            pooled = oracle_attention_pool(feats_chw[lvl], rois, a.strides[lvl],
                                           a.attn_thres)
            acc += pooled[:, :, None, None]
    if out_size == 7:
        fine = roi_align_np(sem_chw, rois, 1.0 / a.strides[0], 14, 0)
        acc += fine.reshape(r, a.fpn_c, 7, 2, 7, 2).mean(axis=(3, 5))
    else:
        acc += roi_align_np(sem_chw, rois, 1.0 / a.strides[0], out_size, 0)
    return acc.astype(np.float32)


def oracle_bbox_head(sd, s, roi_feats_chw, temperature=20.0):
    x = torch.tensor(roi_feats_chw).flatten(1)
    x = F.relu(F.linear(x, sd[f"roi_head.bbox_head.{s}.shared_fcs.0.weight"],
                        sd[f"roi_head.bbox_head.{s}.shared_fcs.0.bias"]))
    x = F.relu(F.linear(x, sd[f"roi_head.bbox_head.{s}.shared_fcs.1.weight"],
                        sd[f"roi_head.bbox_head.{s}.shared_fcs.1.bias"]))
    wt = sd[f"roi_head.bbox_head.{s}.fc_cls.weight"]
    w_ = wt / (wt.norm(dim=1, keepdim=True) + 1e-6)
    x_ = x / (x.norm(dim=1, keepdim=True) + 1e-6) * temperature
    cls = F.linear(x_, w_, sd[f"roi_head.bbox_head.{s}.fc_cls.bias"]).numpy()
    reg = F.linear(x, sd[f"roi_head.bbox_head.{s}.fc_reg.weight"],
                   sd[f"roi_head.bbox_head.{s}.fc_reg.bias"]).numpy()
    return cls, reg


def oracle_mask_head(sd, roi_feats_chw):
    y = torch.tensor(roi_feats_chw)
    for i in range(4):
        y = F.relu(F.conv2d(y, sd[f"roi_head.mask_head.convs.{i}.conv.weight"],
                            sd[f"roi_head.mask_head.convs.{i}.conv.bias"], padding=1))
    y = F.relu(F.conv_transpose2d(y, sd["roi_head.mask_head.upsample.weight"],
                                  sd["roi_head.mask_head.upsample.bias"], stride=2))
    logits = F.conv2d(y, sd["roi_head.mask_head.conv_logits.weight"],
                      sd["roi_head.mask_head.conv_logits.bias"])
    return torch.sigmoid(logits)[:, 0].numpy()


def seesaw_act(cls, nc):
    e = np.exp(cls[:, :nc] - cls[:, :nc].max(1, keepdims=True))
    pc = e / e.sum(1, keepdims=True)
    eo = np.exp(cls[:, nc:] - cls[:, nc:].max(1, keepdims=True))
    po = eo / eo.sum(1, keepdims=True)
    return np.concatenate([pc * po[:, :1], po[:, 1:2]], axis=1)


def oracle_full_forward(sd, img_nhwc: np.ndarray, a: OracleArch):
    """The whole inference graph for ONE normalized image (1, H, W, 3).

    Returns dict(ws_boxes, n_proposals, boxes, scores, labels, probs,
    mask_probs, semantic_logits) — boxes already rescaled to the tile frame
    (/= a.scale), matching NuHTC.__call__ output."""
    bb = oracle_backbone(sd, img_nhwc, a)
    feats = oracle_fpn(sd, [f.permute(0, 3, 1, 2) for f in bb])
    prop_boxes, prop_scores = oracle_rpn_proposals(sd, feats, a)
    sem_logits, sem_emb = oracle_semantic(sd, feats)
    feats_chw = [f[0].numpy() for f in feats]

    if a.watershed:
        ws_boxes = oracle_component_proposals(
            sem_logits, (a.img_hw, a.img_hw), min_area=a.ws_min_area)
        assert len(ws_boxes) <= a.ws_max, "raise ws_max or replicate top-k selection"
        rois = np.concatenate([ws_boxes, prop_boxes], axis=0)
    else:
        ws_boxes = np.zeros((0, 4), np.float32)
        rois = prop_boxes

    n_prop = len(rois)
    cur = rois.copy()
    ms = []
    reg = None
    for s in range(a.num_stages):
        rf = oracle_roi_feats(feats_chw, sem_emb, cur, 7, 2, a)
        cls, reg = oracle_bbox_head(sd, s, rf)
        ms.append(cls)
        if s < a.num_stages - 1:
            cur = np_delta2bbox(cur, reg, (0, 0, 0, 0), STAGE_STDS[s],
                                max_shape=(a.img_hw, a.img_hw))
    cls_avg = sum(ms) / float(a.num_stages)
    act = seesaw_act(cls_avg, a.nc)
    bboxes = np_delta2bbox(cur, reg, (0, 0, 0, 0), STAGE_STDS[a.num_stages - 1],
                           max_shape=(a.img_hw, a.img_hw)) / a.scale

    # multiclass NMS with candidate cap (detector._multiclass_nms:899)
    cand_scores = act[:, :a.nc].reshape(-1)
    cand_labels = np.tile(np.arange(a.nc), n_prop)
    cand_roi = np.repeat(np.arange(n_prop), a.nc)
    sel = np.where(cand_scores > a.score_thr)[0]
    if len(sel) > a.cand:
        order = np.argsort(-cand_scores[sel], kind="stable")[:a.cand]
        sel = sel[order]
    cb = bboxes[cand_roi[sel]]
    cs = cand_scores[sel]
    cl = cand_labels[sel]
    bound = cb.max() if len(cb) else 1.0
    shifted = cb + (cl * (bound + 1.0))[:, None]
    keep = greedy_nms_score_order(shifted, cs, a.rcnn_iou)[:a.max_det]
    det_boxes = cb[keep]
    det_scores = cs[keep]
    det_labels = cl[keep]
    det_probs = act[cand_roi[sel][keep], :a.nc]

    mask_boxes = det_boxes * a.scale
    if len(mask_boxes):
        mrf = oracle_roi_feats(feats_chw, sem_emb, mask_boxes, 14, 0, a)
        mask_probs = oracle_mask_head(sd, mrf)
    else:
        mask_probs = np.zeros((0, 28, 28), np.float32)

    return dict(
        ws_boxes=ws_boxes,
        n_proposals=n_prop,
        boxes=det_boxes,
        scores=det_scores,
        labels=det_labels.astype(np.int32),
        probs=det_probs,
        mask_probs=mask_probs,
        semantic_logits=sem_logits,
    )


# --------------------------------------------------------------------- #
# glue: sd → flax params, detection matching
# --------------------------------------------------------------------- #

def apply_sd(sd, template):
    """Push a reference-format state dict through the checkpoint-converter
    key mapping into a NuHTC param tree (same path as loading a real .pth)."""
    import jax

    from nuhtc_tpu.utils.checkpoint import map_torch_key

    out = jax.tree.map(lambda x: np.array(x), template)
    for key, tensor in sd.items():
        mapped = map_torch_key(key)
        assert mapped is not None, key
        path, tf = mapped
        node = out["params"]
        for part in path[:-1]:
            node = node[part]
        val = np.asarray(tf(tensor.numpy()))
        assert node[path[-1]].shape == val.shape, (key, node[path[-1]].shape, val.shape)
        node[path[-1]] = val
    return out


def box_iou_np(a, b):
    """(N, 4) x (M, 4) → (N, M)."""
    x1 = np.maximum(a[:, None, 0], b[None, :, 0])
    y1 = np.maximum(a[:, None, 1], b[None, :, 1])
    x2 = np.minimum(a[:, None, 2], b[None, :, 2])
    y2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(aa[:, None] + ab[None] - inter, 1e-10)


def match_detections(got, want, iou_thr=0.5):
    """Greedy score-ordered matching of detection sets (same-label, IoU>thr).

    Returns (pairs [(gi, wi)…], unmatched_got idx, unmatched_want idx) —
    the comparison contract for full-chain parity: the PQ gate is a
    detection-level statement, not a bitwise one, so near-threshold single
    pixel flips in the watershed mask must not fail the whole image."""
    gi_free = np.ones(len(got["scores"]), bool)
    pairs = []
    order = np.argsort(-want["scores"], kind="stable")
    if len(got["boxes"]) and len(want["boxes"]):
        iou = box_iou_np(got["boxes"], want["boxes"])
        # degenerate (zero-area) boxes — possible under random weights when
        # refinement pushes a proposal out of frame and clipping collapses
        # it — have IoU 0 against everything; match them by center distance
        ga = ((got["boxes"][:, 2] - got["boxes"][:, 0])
              * (got["boxes"][:, 3] - got["boxes"][:, 1]))
        wa = ((want["boxes"][:, 2] - want["boxes"][:, 0])
              * (want["boxes"][:, 3] - want["boxes"][:, 1]))
        both_tiny = (ga[:, None] < 1.0) & (wa[None, :] < 1.0)
        gc = (got["boxes"][:, :2] + got["boxes"][:, 2:]) / 2
        wc = (want["boxes"][:, :2] + want["boxes"][:, 2:]) / 2
        close = np.abs(gc[:, None] - wc[None]).max(-1) < 1.0
        iou = np.where(both_tiny & close, 1.0, iou)
    else:
        iou = np.zeros((len(got["boxes"]), len(want["boxes"])))
    for wi in order:
        cand = np.where(gi_free & (got["labels"] == want["labels"][wi])
                        & (iou[:, wi] > iou_thr))[0]
        if len(cand):
            gi = cand[np.argmax(iou[cand, wi])]
            gi_free[gi] = False
            pairs.append((int(gi), int(wi)))
    unmatched_got = np.where(gi_free)[0]
    unmatched_want = np.asarray([w for w in range(len(want["scores"]))
                                 if w not in {p[1] for p in pairs}])
    return pairs, unmatched_got, unmatched_want
