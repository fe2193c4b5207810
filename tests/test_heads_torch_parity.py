"""Torch-oracle parity for the remaining checkpoint-bearing modules: FPN,
RPNHead, Shared2FCBBoxHeadWithProb (NormedLinear/Seesaw predictor),
HTCMaskHead (incl. deconv weight layout), FusedSemanticHead — each through
the checkpoint-converter key mapping (reference modules: mmdet fpn.py,
rpn_head.py, convfc_bbox_head + normed_predictor.py, htc_mask_head.py/
fcn_mask_head.py, fused_semantic_head.py)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from nuhtc_tpu.models.bbox_head import Shared2FCBBoxHeadWithProb
from nuhtc_tpu.models.fpn import FPN
from nuhtc_tpu.models.mask_head import FusedSemanticHead, HTCMaskHead
from nuhtc_tpu.models.rpn_head import RPNHead
from nuhtc_tpu.utils.checkpoint import map_torch_key

RNG = np.random.RandomState(7)


def t(*s):
    return torch.tensor(RNG.randn(*s).astype(np.float32) * 0.1)


def _apply_sd(sd, template, strip: int):
    out = jax.tree.map(lambda x: np.array(x), template)
    for key, tensor in sd.items():
        mapped = map_torch_key(key)
        assert mapped is not None, key
        path, tf = mapped
        node = out["params"]
        for part in path[strip:-1]:
            node = node[part]
        val = np.asarray(tf(tensor.numpy()))
        assert node[path[-1]].shape == val.shape, (key, node[path[-1]].shape, val.shape)
        node[path[-1]] = val
    return out


def test_fpn_matches_torch():
    chans = (8, 16, 32, 64)
    oc = 8
    feats_np = [RNG.randn(2, 16 // (2**i), 16 // (2**i), c).astype(np.float32)
                for i, c in enumerate(chans)]
    sd = {}
    for i, c in enumerate(chans):
        sd[f"neck.lateral_convs.{i}.conv.weight"] = t(oc, c, 1, 1)
        sd[f"neck.lateral_convs.{i}.conv.bias"] = t(oc)
        sd[f"neck.fpn_convs.{i}.conv.weight"] = t(oc, oc, 3, 3)
        sd[f"neck.fpn_convs.{i}.conv.bias"] = t(oc)

    # torch oracle (mmdet FPN: 1x1 laterals, nearest top-down, 3x3 outs)
    lat = [
        F.conv2d(torch.tensor(f).permute(0, 3, 1, 2),
                 sd[f"neck.lateral_convs.{i}.conv.weight"],
                 sd[f"neck.lateral_convs.{i}.conv.bias"])
        for i, f in enumerate(feats_np)
    ]
    for i in range(len(lat) - 1, 0, -1):
        lat[i - 1] = lat[i - 1] + F.interpolate(lat[i], size=lat[i - 1].shape[2:], mode="nearest")
    want = [
        F.conv2d(lat[i], sd[f"neck.fpn_convs.{i}.conv.weight"],
                 sd[f"neck.fpn_convs.{i}.conv.bias"], padding=1).permute(0, 2, 3, 1).numpy()
        for i in range(4)
    ]

    fpn = FPN(in_channels=chans, out_channels=oc, dtype=jnp.float32)
    template = fpn.init(jax.random.PRNGKey(0), [jnp.asarray(f) for f in feats_np])
    params = _apply_sd(sd, template, strip=1)
    with jax.default_matmul_precision("float32"):
        got = fpn.apply(params, [jnp.asarray(f) for f in feats_np])
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, atol=2e-4, rtol=1e-3)


def test_rpn_head_matches_torch():
    c, a = 8, 3
    feats_np = [RNG.randn(2, 8, 8, c).astype(np.float32)]
    sd = {
        "rpn_head.rpn_conv.weight": t(c, c, 3, 3),
        "rpn_head.rpn_conv.bias": t(c),
        "rpn_head.rpn_cls.weight": t(a, c, 1, 1),
        "rpn_head.rpn_cls.bias": t(a),
        "rpn_head.rpn_reg.weight": t(4 * a, c, 1, 1),
        "rpn_head.rpn_reg.bias": t(4 * a),
    }
    x = torch.tensor(feats_np[0]).permute(0, 3, 1, 2)
    h = F.relu(F.conv2d(x, sd["rpn_head.rpn_conv.weight"], sd["rpn_head.rpn_conv.bias"], padding=1))
    want_cls = F.conv2d(h, sd["rpn_head.rpn_cls.weight"], sd["rpn_head.rpn_cls.bias"]).permute(0, 2, 3, 1).numpy()
    want_reg = F.conv2d(h, sd["rpn_head.rpn_reg.weight"], sd["rpn_head.rpn_reg.bias"]).permute(0, 2, 3, 1).numpy()

    head = RPNHead(in_channels=c, feat_channels=c, dtype=jnp.float32)
    template = head.init(jax.random.PRNGKey(0), [jnp.asarray(feats_np[0])])
    params = _apply_sd(sd, template, strip=1)
    with jax.default_matmul_precision("float32"):
        cls, reg = head.apply(params, [jnp.asarray(feats_np[0])])
    np.testing.assert_allclose(np.asarray(cls[0]), want_cls, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(reg[0]), want_reg, atol=2e-4, rtol=1e-3)


def test_bbox_head_matches_torch():
    c, nc, fc = 8, 5, 16
    r = 6
    roi_np = RNG.randn(r, 7, 7, c).astype(np.float32)
    sd = {
        "roi_head.bbox_head.0.shared_fcs.0.weight": t(fc, c * 49),
        "roi_head.bbox_head.0.shared_fcs.0.bias": t(fc),
        "roi_head.bbox_head.0.shared_fcs.1.weight": t(fc, fc),
        "roi_head.bbox_head.0.shared_fcs.1.bias": t(fc),
        "roi_head.bbox_head.0.fc_cls.weight": t(nc + 2, fc),
        "roi_head.bbox_head.0.fc_cls.bias": t(nc + 2),
        "roi_head.bbox_head.0.fc_reg.weight": t(4, fc),
        "roi_head.bbox_head.0.fc_reg.bias": t(4),
    }
    # torch oracle: mmdet flattens (R, C, 7, 7) channel-first
    x = torch.tensor(roi_np).permute(0, 3, 1, 2).flatten(1)
    x = F.relu(F.linear(x, sd["roi_head.bbox_head.0.shared_fcs.0.weight"],
                        sd["roi_head.bbox_head.0.shared_fcs.0.bias"]))
    x = F.relu(F.linear(x, sd["roi_head.bbox_head.0.shared_fcs.1.weight"],
                        sd["roi_head.bbox_head.0.shared_fcs.1.bias"]))
    wt = sd["roi_head.bbox_head.0.fc_cls.weight"]
    w_ = wt / (wt.norm(dim=1, keepdim=True) + 1e-6)  # NormedLinear power=1
    x_ = x / (x.norm(dim=1, keepdim=True) + 1e-6) * 20.0
    want_cls = F.linear(x_, w_, sd["roi_head.bbox_head.0.fc_cls.bias"]).numpy()
    want_reg = F.linear(x, sd["roi_head.bbox_head.0.fc_reg.weight"],
                        sd["roi_head.bbox_head.0.fc_reg.bias"]).numpy()

    head = Shared2FCBBoxHeadWithProb(num_classes=nc, in_channels=c, fc_out_channels=fc,
                                     dtype=jnp.float32)
    template = head.init(jax.random.PRNGKey(0), jnp.asarray(roi_np))
    params = _apply_sd(sd, template, strip=1)
    with jax.default_matmul_precision("float32"):
        cls, reg = head.apply(params, jnp.asarray(roi_np))
    np.testing.assert_allclose(np.asarray(cls), want_cls, atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(reg), want_reg, atol=2e-4, rtol=1e-3)


def test_mask_head_matches_torch():
    c = 8
    r = 4
    x_np = RNG.randn(r, 14, 14, c).astype(np.float32)
    sd = {}
    for i in range(4):
        sd[f"roi_head.mask_head.convs.{i}.conv.weight"] = t(c, c, 3, 3)
        sd[f"roi_head.mask_head.convs.{i}.conv.bias"] = t(c)
    sd["roi_head.mask_head.upsample.weight"] = t(c, c, 2, 2)  # (in, out, kh, kw)
    sd["roi_head.mask_head.upsample.bias"] = t(c)
    sd["roi_head.mask_head.conv_logits.weight"] = t(1, c, 1, 1)
    sd["roi_head.mask_head.conv_logits.bias"] = t(1)

    y = torch.tensor(x_np).permute(0, 3, 1, 2)
    for i in range(4):
        y = F.relu(F.conv2d(y, sd[f"roi_head.mask_head.convs.{i}.conv.weight"],
                            sd[f"roi_head.mask_head.convs.{i}.conv.bias"], padding=1))
    y = F.relu(F.conv_transpose2d(y, sd["roi_head.mask_head.upsample.weight"],
                                  sd["roi_head.mask_head.upsample.bias"], stride=2))
    want = F.conv2d(y, sd["roi_head.mask_head.conv_logits.weight"],
                    sd["roi_head.mask_head.conv_logits.bias"]).permute(0, 2, 3, 1).numpy()

    head = HTCMaskHead(in_channels=c, conv_out_channels=c, num_classes=5,
                       class_agnostic=True, dtype=jnp.float32)
    template = head.init(jax.random.PRNGKey(0), jnp.asarray(x_np),
                         res_feat=None, return_logits=True, return_feat=False)
    params = _apply_sd(sd, template, strip=1)
    with jax.default_matmul_precision("float32"):
        got = head.apply(params, jnp.asarray(x_np), res_feat=None,
                         return_logits=True, return_feat=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


def test_semantic_head_matches_torch():
    c = 8
    feats_np = [RNG.randn(2, 16 // (2**i), 16 // (2**i), c).astype(np.float32)
                for i in range(4)]
    sd = {}
    for i in range(4):
        sd[f"roi_head.semantic_head.lateral_convs.{i}.conv.weight"] = t(c, c, 1, 1)
        sd[f"roi_head.semantic_head.lateral_convs.{i}.conv.bias"] = t(c)
    for i in range(4):
        sd[f"roi_head.semantic_head.convs.{i}.conv.weight"] = t(c, c, 3, 3)
        sd[f"roi_head.semantic_head.convs.{i}.conv.bias"] = t(c)
    sd["roi_head.semantic_head.conv_embedding.conv.weight"] = t(c, c, 1, 1)
    sd["roi_head.semantic_head.conv_embedding.conv.bias"] = t(c)
    sd["roi_head.semantic_head.conv_logits.weight"] = t(1, c, 1, 1)
    sd["roi_head.semantic_head.conv_logits.bias"] = t(1)

    lat = [
        F.relu(F.conv2d(torch.tensor(f).permute(0, 3, 1, 2),
                        sd[f"roi_head.semantic_head.lateral_convs.{i}.conv.weight"],
                        sd[f"roi_head.semantic_head.lateral_convs.{i}.conv.bias"]))
        for i, f in enumerate(feats_np)
    ]
    fused = lat[0]
    for i in range(1, 4):
        fused = fused + F.interpolate(lat[i], size=fused.shape[2:], mode="bilinear",
                                      align_corners=True)
    y = fused
    for i in range(4):
        y = F.relu(F.conv2d(y, sd[f"roi_head.semantic_head.convs.{i}.conv.weight"],
                            sd[f"roi_head.semantic_head.convs.{i}.conv.bias"], padding=1))
    want_logits = F.conv2d(y, sd["roi_head.semantic_head.conv_logits.weight"],
                           sd["roi_head.semantic_head.conv_logits.bias"]).permute(0, 2, 3, 1).numpy()
    want_emb = F.relu(F.conv2d(y, sd["roi_head.semantic_head.conv_embedding.conv.weight"],
                               sd["roi_head.semantic_head.conv_embedding.conv.bias"])
                      ).permute(0, 2, 3, 1).numpy()

    head = FusedSemanticHead(in_channels=c, conv_out_channels=c, num_classes=1,
                             dtype=jnp.float32)
    template = head.init(jax.random.PRNGKey(0), [jnp.asarray(f) for f in feats_np])
    params = _apply_sd(sd, template, strip=1)
    with jax.default_matmul_precision("float32"):
        logits, emb = head.apply(params, [jnp.asarray(f) for f in feats_np])
    np.testing.assert_allclose(np.asarray(logits), want_logits, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(emb), want_emb, atol=2e-4, rtol=1e-3)
