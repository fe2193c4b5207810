"""Composed torch/numpy-oracle parity for the full post-backbone detector
chain: FPN → RPN get_bboxes (level top-k, decode, min-size, level-separated
NMS) → semantic head → 3-stage cascade (attention-RoI features + semantic
fusion → Shared2FC+NormedLinear, stage-averaged scores, DeltaXYWH refine) →
seesaw activation → multiclass NMS (per-class prob vectors) → mask head.

Weights are pushed through the reference state-dict key mapping
(utils/checkpoint.map_torch_key), so this pins end-to-end numeric parity of
the composed inference graph against an independent implementation — the
stand-in for the PQ gate until a reference checkpoint is available.

Reference semantics oracled here: mmdet rpn_head.py get_bboxes,
htc_roi_head_cus.py:2184-2377 (Lite simple_test: cascade + score averaging),
nuhtc/models/bbox_head.py:12-102 (multiclass NMS with prob vectors),
roi_extractors_cus.py:216-245 (attention RoI), seesaw activation
(mmdet seesaw_loss.py:157-175), fcn/htc mask head.

The backbone is bypassed (bb_feats injection) — Swin has its own
torch-parity suite (test_swin_torch_parity.py).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from nuhtc_tpu.models.detector import NuHTC, STAGE_STDS
from nuhtc_tpu.ops.anchors import grid_anchors
from nuhtc_tpu.utils.checkpoint import map_torch_key

from test_ops_boxes_nms import np_delta2bbox
from test_ops_roi_align import roi_align_ref

RNG = np.random.RandomState(11)

# tiny geometry: 64x64 input frame, 4 levels
CH = (16, 32, 64, 128)  # = Swin(embed_dims=16) per-level out channels
FPN_C = 16
NC = 5
HW = 64
STRIDES = (4, 8, 16, 32)
SIZES = [(HW // s, HW // s) for s in STRIDES]
A = 3
NMS_PRE, RPN_MAX, RPN_IOU, MIN_BS = 48, 24, 0.7, 2.0
SCORE_THR, RCNN_IOU, MAX_DET, CAND = 0.05, 0.5, 8, 128
ATTN_THRES = 0.965926
SCALE = 2.0


def t(*s):
    return torch.tensor(RNG.randn(*s).astype(np.float32) * 0.1)


def _build_sd():
    sd = {}
    for i, c in enumerate(CH):
        sd[f"neck.lateral_convs.{i}.conv.weight"] = t(FPN_C, c, 1, 1)
        sd[f"neck.lateral_convs.{i}.conv.bias"] = t(FPN_C)
        sd[f"neck.fpn_convs.{i}.conv.weight"] = t(FPN_C, FPN_C, 3, 3)
        sd[f"neck.fpn_convs.{i}.conv.bias"] = t(FPN_C)
    sd["rpn_head.rpn_conv.weight"] = t(FPN_C, FPN_C, 3, 3)
    sd["rpn_head.rpn_conv.bias"] = t(FPN_C)
    sd["rpn_head.rpn_cls.weight"] = t(A, FPN_C, 1, 1)
    sd["rpn_head.rpn_cls.bias"] = t(A)
    sd["rpn_head.rpn_reg.weight"] = t(A * 4, FPN_C, 1, 1)
    sd["rpn_head.rpn_reg.bias"] = t(A * 4)
    for i in range(4):
        sd[f"roi_head.semantic_head.lateral_convs.{i}.conv.weight"] = t(FPN_C, FPN_C, 1, 1)
        sd[f"roi_head.semantic_head.lateral_convs.{i}.conv.bias"] = t(FPN_C)
        sd[f"roi_head.semantic_head.convs.{i}.conv.weight"] = t(FPN_C, FPN_C, 3, 3)
        sd[f"roi_head.semantic_head.convs.{i}.conv.bias"] = t(FPN_C)
    sd["roi_head.semantic_head.conv_embedding.conv.weight"] = t(FPN_C, FPN_C, 1, 1)
    sd["roi_head.semantic_head.conv_embedding.conv.bias"] = t(FPN_C)
    sd["roi_head.semantic_head.conv_logits.weight"] = t(1, FPN_C, 1, 1)
    sd["roi_head.semantic_head.conv_logits.bias"] = t(1)
    fc = 256  # Shared2FCBBoxHeadWithProb default fc_out_channels
    for s in range(3):
        sd[f"roi_head.bbox_head.{s}.shared_fcs.0.weight"] = t(fc, FPN_C * 49)
        sd[f"roi_head.bbox_head.{s}.shared_fcs.0.bias"] = t(fc)
        sd[f"roi_head.bbox_head.{s}.shared_fcs.1.weight"] = t(fc, fc)
        sd[f"roi_head.bbox_head.{s}.shared_fcs.1.bias"] = t(fc)
        sd[f"roi_head.bbox_head.{s}.fc_cls.weight"] = t(NC + 2, fc)
        sd[f"roi_head.bbox_head.{s}.fc_cls.bias"] = t(NC + 2)
        sd[f"roi_head.bbox_head.{s}.fc_reg.weight"] = t(4, fc) * 0.2
        sd[f"roi_head.bbox_head.{s}.fc_reg.bias"] = t(4) * 0.2
    for i in range(4):
        sd[f"roi_head.mask_head.convs.{i}.conv.weight"] = t(FPN_C, FPN_C, 3, 3)
        sd[f"roi_head.mask_head.convs.{i}.conv.bias"] = t(FPN_C)
    sd["roi_head.mask_head.upsample.weight"] = t(FPN_C, FPN_C, 2, 2)
    sd["roi_head.mask_head.upsample.bias"] = t(FPN_C)
    sd["roi_head.mask_head.conv_logits.weight"] = t(1, FPN_C, 1, 1)
    sd["roi_head.mask_head.conv_logits.bias"] = t(1)
    return sd


def _apply_sd(sd, template):
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


# --------------------------------------------------------------------- #
# numpy/torch oracle pieces
# --------------------------------------------------------------------- #

def _oracle_fpn(sd, bb_feats):
    lat = [
        F.conv2d(torch.tensor(f).permute(0, 3, 1, 2),
                 sd[f"neck.lateral_convs.{i}.conv.weight"],
                 sd[f"neck.lateral_convs.{i}.conv.bias"])
        for i, f in enumerate(bb_feats)
    ]
    for i in range(3, 0, -1):
        lat[i - 1] = lat[i - 1] + F.interpolate(lat[i], scale_factor=2, mode="nearest")
    return [
        F.conv2d(l, sd[f"neck.fpn_convs.{i}.conv.weight"],
                 sd[f"neck.fpn_convs.{i}.conv.bias"], padding=1)
        for i, l in enumerate(lat)
    ]


def _oracle_rpn_heads(sd, feats):
    cls_out, reg_out = [], []
    for f in feats:
        h = F.relu(F.conv2d(f, sd["rpn_head.rpn_conv.weight"],
                            sd["rpn_head.rpn_conv.bias"], padding=1))
        cls_out.append(F.conv2d(h, sd["rpn_head.rpn_cls.weight"], sd["rpn_head.rpn_cls.bias"]))
        reg_out.append(F.conv2d(h, sd["rpn_head.rpn_reg.weight"], sd["rpn_head.rpn_reg.bias"]))
    return cls_out, reg_out


def _greedy_nms_score_order(boxes, scores, thr):
    """Greedy NMS → kept indices in descending-score order."""
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


def _oracle_rpn_proposals(cls_out, reg_out):
    anchors = grid_anchors(SIZES, STRIDES, (4,), (0.5, 1.0, 2.0))
    all_boxes, all_scores, all_ids = [], [], []
    for lvl in range(4):
        scores = torch.sigmoid(cls_out[lvl][0]).permute(1, 2, 0).reshape(-1).numpy()
        deltas = reg_out[lvl][0].permute(1, 2, 0).reshape(-1, 4).numpy()
        anc = anchors[lvl]
        if NMS_PRE < len(scores):
            topk = np.argsort(-scores, kind="stable")[:NMS_PRE]
            scores, deltas, anc = scores[topk], deltas[topk], anc[topk]
        boxes = np_delta2bbox(anc, deltas, (0, 0, 0, 0), (1, 1, 1, 1), max_shape=(HW, HW))
        all_boxes.append(boxes)
        all_scores.append(scores)
        all_ids.append(np.full(len(scores), lvl))
    boxes = np.concatenate(all_boxes)
    scores = np.concatenate(all_scores)
    ids = np.concatenate(all_ids)
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    ok = (w > MIN_BS) & (h > MIN_BS)
    boxes, scores, ids = boxes[ok], scores[ok], ids[ok]
    # level-separated NMS via coordinate offset (coord_bound = max img dim)
    shifted = boxes + (ids * (float(HW) + 1.0))[:, None]
    keep = _greedy_nms_score_order(shifted, scores, RPN_IOU)[:RPN_MAX]
    return boxes[keep], scores[keep]


def _oracle_semantic(sd, feats):
    lat = [
        F.relu(F.conv2d(feats[i], sd[f"roi_head.semantic_head.lateral_convs.{i}.conv.weight"],
                        sd[f"roi_head.semantic_head.lateral_convs.{i}.conv.bias"]))
        for i in range(4)
    ]
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
    return emb[0].numpy()  # (C, H0, W0)


def _oracle_attention_pool(feat_chw, rois, stride):
    """reference roi_extractors_cus.py:216-245 (see
    test_ops_roi_align.test_attention_pool_matches_torch_formula)."""
    c, h, w = feat_chw.shape
    tf = torch.from_numpy(feat_chw)[None]
    trois = torch.from_numpy(rois.astype(np.float32))
    roi_x = torch.div((trois[:, 0] + trois[:, 2]), 2 * stride, rounding_mode="floor").clamp(0, w - 1)
    roi_y = torch.div((trois[:, 1] + trois[:, 3]), 2 * stride, rounding_mode="floor").clamp(0, h - 1)
    roi_vec = tf[0, :, roi_y.long(), roi_x.long()].T
    feat_vec = tf[0].permute(1, 2, 0).reshape(-1, c)
    sim = F.relu(F.cosine_similarity(roi_vec.unsqueeze(1), feat_vec.unsqueeze(0), dim=2)
                 - ATTN_THRES) + ATTN_THRES
    sim = sim.view(-1, 1, h, w)
    return torch.mean(tf[0].unsqueeze(0) * sim, dim=(2, 3)).numpy()  # (R, C)


def _oracle_roi_feats(feats_chw, sem_chw, rois, out_size, sampling_ratio):
    """attention_roi_features + semantic fusion for ONE image → (R, C, S, S)."""
    r = len(rois)
    acc = np.zeros((r, FPN_C, out_size, out_size), np.float64)
    for lvl in range(4):
        if lvl < 2:
            acc += roi_align_ref(feats_chw[lvl], rois, 1.0 / STRIDES[lvl],
                                 out_size, sampling_ratio)
        else:
            pooled = _oracle_attention_pool(feats_chw[lvl], rois, STRIDES[lvl])
            acc += pooled[:, :, None, None]
    if out_size == 7:
        fine = roi_align_ref(sem_chw, rois, 1.0 / STRIDES[0], 14, 0)
        acc += fine.reshape(r, FPN_C, 7, 2, 7, 2).mean(axis=(3, 5))
    else:
        acc += roi_align_ref(sem_chw, rois, 1.0 / STRIDES[0], out_size, 0)
    return acc.astype(np.float32)


def _oracle_bbox_head(sd, s, roi_feats_chw):
    x = torch.tensor(roi_feats_chw).flatten(1)
    x = F.relu(F.linear(x, sd[f"roi_head.bbox_head.{s}.shared_fcs.0.weight"],
                        sd[f"roi_head.bbox_head.{s}.shared_fcs.0.bias"]))
    x = F.relu(F.linear(x, sd[f"roi_head.bbox_head.{s}.shared_fcs.1.weight"],
                        sd[f"roi_head.bbox_head.{s}.shared_fcs.1.bias"]))
    wt = sd[f"roi_head.bbox_head.{s}.fc_cls.weight"]
    w_ = wt / (wt.norm(dim=1, keepdim=True) + 1e-6)
    x_ = x / (x.norm(dim=1, keepdim=True) + 1e-6) * 20.0
    cls = F.linear(x_, w_, sd[f"roi_head.bbox_head.{s}.fc_cls.bias"]).numpy()
    reg = F.linear(x, sd[f"roi_head.bbox_head.{s}.fc_reg.weight"],
                   sd[f"roi_head.bbox_head.{s}.fc_reg.bias"]).numpy()
    return cls, reg


def _oracle_mask_head(sd, roi_feats_chw):
    y = torch.tensor(roi_feats_chw)
    for i in range(4):
        y = F.relu(F.conv2d(y, sd[f"roi_head.mask_head.convs.{i}.conv.weight"],
                            sd[f"roi_head.mask_head.convs.{i}.conv.bias"], padding=1))
    y = F.relu(F.conv_transpose2d(y, sd["roi_head.mask_head.upsample.weight"],
                                  sd["roi_head.mask_head.upsample.bias"], stride=2))
    logits = F.conv2d(y, sd["roi_head.mask_head.conv_logits.weight"],
                      sd["roi_head.mask_head.conv_logits.bias"])
    return torch.sigmoid(logits)[:, 0].numpy()  # (R, 28, 28)


def _seesaw_act(cls):
    e = np.exp(cls[:, :NC] - cls[:, :NC].max(1, keepdims=True))
    pc = e / e.sum(1, keepdims=True)
    eo = np.exp(cls[:, NC:] - cls[:, NC:].max(1, keepdims=True))
    po = eo / eo.sum(1, keepdims=True)
    return np.concatenate([pc * po[:, :1], po[:, 1:2]], axis=1)


def test_composed_detector_matches_oracle():
    sd = _build_sd()
    model = NuHTC(
        num_classes=NC, fpn_channels=FPN_C, strides=STRIDES,
        rpn_nms_pre=NMS_PRE, rpn_max_per_img=RPN_MAX, rpn_nms_iou=RPN_IOU,
        rpn_min_bbox_size=MIN_BS, rcnn_score_thr=SCORE_THR,
        rcnn_nms_iou=RCNN_IOU, rcnn_max_per_img=MAX_DET,
        nms_candidates=CAND, watershed_proposal=False,
        scale_factor=SCALE, exact_rois=True, dtype=jnp.float32,
        backbone_cfg=dict(embed_dims=16, depths=(1, 1, 1, 1),
                          num_heads=(1, 2, 4, 8), window_size=7),
    )
    img0 = jnp.zeros((1, HW, HW, 3), jnp.float32)
    template = model.init(jax.random.PRNGKey(0), img0, method="init_forward")
    # backbone params must exist in the template but are bypassed below
    bb_np = [RNG.randn(1, h, w, c).astype(np.float32)
             for (h, w), c in zip(SIZES, CH)]
    params = _apply_sd(sd, template)

    with jax.default_matmul_precision("float32"):
        out = model.apply(
            params, img0, bb_feats=tuple(jnp.asarray(f) for f in bb_np)
        )
    out = {k: np.asarray(v) for k, v in out.items()}

    # ---------------- oracle ----------------
    feats_t = _oracle_fpn(sd, bb_np)
    cls_out, reg_out = _oracle_rpn_heads(sd, feats_t)
    prop_boxes, prop_scores = _oracle_rpn_proposals(cls_out, reg_out)
    sem_chw = _oracle_semantic(sd, feats_t)
    feats_chw = [f[0].numpy() for f in feats_t]

    n_prop = len(prop_boxes)
    rois = prop_boxes.copy()
    ms = []
    for s in range(3):
        rf = _oracle_roi_feats(feats_chw, sem_chw, rois, 7, 2)
        cls, reg = _oracle_bbox_head(sd, s, rf)
        ms.append(cls)
        if s < 2:
            rois = np_delta2bbox(rois, reg, (0, 0, 0, 0), STAGE_STDS[s], max_shape=(HW, HW))
    cls_avg = sum(ms) / 3.0
    act = _seesaw_act(cls_avg)  # (R, NC+1)
    bboxes = np_delta2bbox(rois, reg, (0, 0, 0, 0), STAGE_STDS[2], max_shape=(HW, HW)) / SCALE

    # multiclass NMS oracle (detector._multiclass_nms semantics)
    cand_scores = act[:, :NC].reshape(-1)
    cand_valid = cand_scores > SCORE_THR
    cand_labels = np.tile(np.arange(NC), n_prop)
    cand_roi = np.repeat(np.arange(n_prop), NC)
    sel = np.where(cand_valid)[0]
    cb = bboxes[cand_roi[sel]]
    cs = cand_scores[sel]
    cl = cand_labels[sel]
    bound = cb.max() if len(cb) else 1.0
    shifted = cb + (cl * (bound + 1.0))[:, None]
    keep = _greedy_nms_score_order(shifted, cs, RCNN_IOU)[:MAX_DET]
    want_boxes = cb[keep]
    want_scores = cs[keep]
    want_labels = cl[keep]
    want_probs = act[cand_roi[sel][keep], :NC]
    k = len(keep)
    assert k > 0, "oracle produced no detections — pick a different seed"

    got_valid = out["valid"][0]
    assert int(got_valid.sum()) == k
    np.testing.assert_allclose(out["boxes"][0][:k], want_boxes, rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(out["scores"][0][:k], want_scores, rtol=1e-3, atol=1e-4)
    np.testing.assert_array_equal(out["labels"][0][:k], want_labels)
    np.testing.assert_allclose(out["probs"][0][:k], want_probs, rtol=1e-3, atol=1e-4)

    # ---------------- mask branch ----------------
    mask_boxes = want_boxes * SCALE
    mrf = _oracle_roi_feats(feats_chw, sem_chw, mask_boxes, 14, 0)
    want_masks = _oracle_mask_head(sd, mrf)
    np.testing.assert_allclose(out["mask_probs"][0][:k], want_masks, rtol=2e-3, atol=2e-3)
