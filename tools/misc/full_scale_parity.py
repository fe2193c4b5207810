#!/usr/bin/env python
"""Full-scale end-to-end numerical parity harness (VERDICT round-2 #2).

Runs the REAL architecture — Swin-T 96/[2,2,6,2], 64-ch FPN, 3 cascade
stages, watershed proposals ON, 512x512 input (256 tiles x2 rescale, the
production recipe of configs/nuhtc/htc_lite_swin_fpn_pannuke.py) — on the
6 reference demo images, against the fully independent torch/numpy oracle
in tests/torch_oracle.py, with weights flowing through the reference
state-dict key mapping exactly like a real checkpoint would
(reference htc_roi_head_cus.py:2184-2377, fcn_mask_head.py:179-344).

Outputs:
  tests/goldens/full_scale/<img>.npz   oracle detections/masks (the golden)
  tests/goldens/full_scale/REPORT.md   f32/HIGHEST + bf16 delta report

The moment a real reference checkpoint appears, PQ parity is one command:
  python tools/misc/full_scale_parity.py --checkpoint models/pannuke.pth
(oracle + JAX graph both consume the real weights, production score_thr).

Mint goldens + report (~15 min on one CPU core):
  JAX_PLATFORMS=cpu PYTHONPATH=. python tools/misc/full_scale_parity.py --mint
Check the JAX graph against committed goldens (what the opt-in test does):
  JAX_PLATFORMS=cpu PYTHONPATH=. python tools/misc/full_scale_parity.py
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np

DEMO_DIR = "/root/reference/demo/imgs"
GOLDEN_DIR = os.path.join(REPO, "tests", "goldens", "full_scale")
SEED = 42

# f32/HIGHEST gate thresholds (see REPORT.md for measured headroom —
# 500/500 detections matched on all 6 demo imgs; worst box delta 0.175px)
F32_MATCH_RATE = 0.98
F32_SCORE_TOL = 2e-3
F32_BOX_TOL = 0.5  # px in the 256 tile frame — sub-pixel box agreement


def load_demo_images():
    paths = sorted(glob.glob(os.path.join(DEMO_DIR, "*.png")))
    if not paths:
        return [], []
    import cv2

    imgs = []
    for p in paths:
        im = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        assert im.shape[:2] == (256, 256), (p, im.shape)
        imgs.append(im)
    return [os.path.splitext(os.path.basename(p))[0] for p in paths], imgs


def build_model(dtype, exact, score_thr=0.05):
    from nuhtc_tpu.models.detector import NuHTC

    return NuHTC(
        num_classes=5, fpn_channels=64, strides=(4, 8, 16, 32),
        rpn_nms_pre=3000, rpn_max_per_img=1000, rpn_nms_iou=0.7,
        rpn_min_bbox_size=10.0, rcnn_score_thr=score_thr, rcnn_nms_iou=0.5,
        rcnn_max_per_img=500, nms_candidates=2048,
        watershed_proposal=True, watershed_max=512, watershed_min_area=10,
        scale_factor=2.0, exact_rois=exact, dtype=dtype,
        backbone_cfg=dict(embed_dims=96, depths=(2, 2, 6, 2),
                          num_heads=(3, 6, 12, 24), window_size=7,
                          drop_path_rate=0.0),
    )


def run_jax(params, imgs_prep, dtype, exact, score_thr=0.05):
    """→ list of per-image dicts with only the VALID detections."""
    import jax
    import jax.numpy as jnp

    model = build_model(dtype, exact, score_thr)
    fwd = jax.jit(lambda p, x: model.apply(p, x))
    outs = []
    for img in imgs_prep:
        with jax.default_matmul_precision("float32" if exact else "bfloat16"):
            o = fwd(params, jnp.asarray(img[None]))
        o = {k: np.asarray(v[0]) for k, v in o.items()}
        v = o["valid"].astype(bool)
        outs.append(dict(
            boxes=o["boxes"][v].astype(np.float32),
            scores=o["scores"][v].astype(np.float32),
            labels=o["labels"][v].astype(np.int32),
            probs=o["probs"][v].astype(np.float32),
            mask_probs=o["mask_probs"][v].astype(np.float32),
        ))
    return outs


def compare_one(got, want, iou_thr=0.5):
    from torch_oracle import match_detections

    pairs, un_got, un_want = match_detections(got, want, iou_thr)
    stats = dict(
        n_want=len(want["scores"]), n_got=len(got["scores"]),
        matched=len(pairs), unmatched_want=len(un_want), unmatched_got=len(un_got),
        match_rate=len(pairs) / max(len(want["scores"]), 1),
    )
    if pairs:
        gi = np.asarray([p[0] for p in pairs])
        wi = np.asarray([p[1] for p in pairs])
        stats["score_mad"] = float(np.mean(np.abs(got["scores"][gi] - want["scores"][wi])))
        stats["score_max"] = float(np.max(np.abs(got["scores"][gi] - want["scores"][wi])))
        stats["box_max"] = float(np.max(np.abs(got["boxes"][gi] - want["boxes"][wi])))
        gm = got["mask_probs"][gi]
        wm = want["mask_probs"][wi]
        if gm.size and wm.size:
            stats["mask_mae"] = float(np.mean(np.abs(gm - wm)))
            stats["mask_max"] = float(np.max(np.abs(gm - wm)))
    # score of the best unmatched golden det — low = a borderline det flipped
    if len(un_want):
        stats["unmatched_want_topscore"] = float(np.max(want["scores"][un_want]))
    if len(un_got):
        stats["unmatched_got_topscore"] = float(np.max(got["scores"][un_got]))
    return stats


def assert_nonvacuous_goldens(goldens: dict) -> None:
    """Zero golden detections makes every match-rate gate vacuously true —
    refuse to compare against (or to have minted) such goldens."""
    n_golden = sum(int(np.asarray(g["boxes"]).shape[0]) for g in goldens.values())
    if n_golden == 0:
        raise SystemExit(
            "FATAL: goldens contain 0 detections across all images — the "
            "parity comparison is vacuous; not producing a report.")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mint", action="store_true",
                    help="run the torch oracle and (re)write the goldens + report")
    ap.add_argument("--skip-bf16", action="store_true")
    ap.add_argument("--limit", type=int, default=0, help="first N images only")
    ap.add_argument("--checkpoint", default=None,
                    help="real reference .pth state dict — the oracle and the "
                         "JAX graph both consume it instead of the synthetic "
                         "seed-%d weights; implies --mint (fresh goldens + "
                         "report for the real weights)" % SEED)
    args = ap.parse_args()
    if args.checkpoint:
        args.mint = True

    names, imgs = load_demo_images()
    if not imgs:
        print(f"no demo images at {DEMO_DIR} — nothing to do")
        return
    if args.limit:
        names, imgs = names[:args.limit], imgs[:args.limit]

    import jax.numpy as jnp

    from nuhtc_tpu.data.pipelines import preprocess_test_image
    from torch_oracle import OracleArch, apply_sd, build_full_sd, oracle_full_forward

    arch = OracleArch()
    if args.checkpoint:
        # real reference weights: production score threshold, torch tensors
        # keyed exactly like build_full_sd's synthetic tree
        import torch

        arch = OracleArch(score_thr=0.35)
        raw = torch.load(args.checkpoint, map_location="cpu")
        raw = raw.get("state_dict", raw)
        # the lite variant stores its single mask head as ModuleList entry 0;
        # the oracle indexes it without the stage prefix
        sd = {k.replace("mask_head.0.", "mask_head."): v.float()
              for k, v in raw.items() if v.dtype.is_floating_point}
    else:
        sd = build_full_sd(np.random.RandomState(SEED), arch)
    imgs_prep = [np.asarray(preprocess_test_image(im, arch.scale)) for im in imgs]

    # params via the reference key mapping (the real-checkpoint path)
    import jax

    model = build_model(jnp.float32, exact=True, score_thr=arch.score_thr)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3), jnp.float32),
                          method="init_forward")
    if args.checkpoint:
        # the production converter tolerates real-checkpoint extras
        # (buffers, bn counters) that apply_sd's strict mapping rejects
        from nuhtc_tpu.utils.checkpoint import load_torch_checkpoint

        params, info = load_torch_checkpoint(args.checkpoint, template)
        if info.get("unmatched_torch"):
            print(f"# {len(info['unmatched_torch'])} torch keys unmatched")
    else:
        params = apply_sd(sd, template)

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    goldens = {}
    if args.mint:
        for name, img in zip(names, imgs_prep):
            print(f"oracle: {name} ...", flush=True)
            want = oracle_full_forward(sd, img[None], arch)
            goldens[name] = want
            np.savez_compressed(
                os.path.join(GOLDEN_DIR, f"{name}.npz"),
                boxes=want["boxes"], scores=want["scores"], labels=want["labels"],
                probs=want["probs"], mask_probs=want["mask_probs"].astype(np.float16),
                ws_boxes=want["ws_boxes"], n_proposals=want["n_proposals"],
                sem_mean=np.float32(want["semantic_logits"].mean()),
                sem_std=np.float32(want["semantic_logits"].std()),
            )
    else:
        for name in names:
            path = os.path.join(GOLDEN_DIR, f"{name}.npz")
            assert os.path.exists(path), f"golden missing: {path} (run --mint first)"
            z = np.load(path)
            goldens[name] = {k: z[k] for k in z.files}
            goldens[name]["mask_probs"] = goldens[name]["mask_probs"].astype(np.float32)

    assert_nonvacuous_goldens(goldens)

    print("jax f32/HIGHEST exact ...", flush=True)
    got_f32 = run_jax(params, imgs_prep, jnp.float32, exact=True,
                      score_thr=arch.score_thr)
    rows_f32 = []
    for name, got in zip(names, got_f32):
        st = compare_one(got, goldens[name])
        rows_f32.append((name, st))
        print(name, st, flush=True)

    rows_bf16 = []
    if not args.skip_bf16:
        print("jax bf16 production path ...", flush=True)
        got_bf16 = run_jax(params, imgs_prep, jnp.bfloat16, exact=False,
                           score_thr=arch.score_thr)
        for name, got in zip(names, got_bf16):
            st = compare_one(got, goldens[name])
            rows_bf16.append((name, st))
            print(name, st, flush=True)

    failures = []
    for name, st in rows_f32:
        if st["match_rate"] < F32_MATCH_RATE:
            failures.append(f"{name}: match_rate {st['match_rate']:.3f} < {F32_MATCH_RATE}")
        if st.get("score_max", 0) > F32_SCORE_TOL:
            failures.append(f"{name}: score_max {st['score_max']:.2e} > {F32_SCORE_TOL}")
        if st.get("box_max", 0) > F32_BOX_TOL:
            failures.append(f"{name}: box_max {st['box_max']:.3f} > {F32_BOX_TOL}")

    if args.mint:
        lines = [
            "# Full-scale parity report",
            "",
            "Real architecture (Swin-T 96/[2,2,6,2], FPN 64, 3 stages, watershed ON,",
            f"512² input) vs the independent torch/numpy oracle, seed {SEED} weights",
            "pushed through the reference state-dict key mapping. Detection-level",
            "comparison (greedy same-label IoU>0.5 matching — the PQ gate is a",
            "detection-level statement; single near-threshold watershed pixels may",
            "legitimately flip, so bitwise set equality is not the contract).",
            "",
            "## f32 / HIGHEST (exact RoI ops)",
            "",
            "| img | golden dets | matched | score_max | box_max(px) | mask_max |",
            "|---|---|---|---|---|---|",
        ]
        for name, st in rows_f32:
            lines.append(
                f"| {name} | {st['n_want']} | {st['matched']} | "
                f"{st.get('score_max', 0):.2e} | {st.get('box_max', 0):.3f} | "
                f"{st.get('mask_max', 0):.2e} |")
        if rows_bf16:
            lines += ["", "## bf16 production path (banded RoI, fused kernels)", "",
                      "| img | golden dets | matched | score_mad | score_max | mask_mae |",
                      "|---|---|---|---|---|---|"]
            for name, st in rows_bf16:
                lines.append(
                    f"| {name} | {st['n_want']} | {st['matched']} | "
                    f"{st.get('score_mad', 0):.2e} | {st.get('score_max', 0):.2e} | "
                    f"{st.get('mask_mae', 0):.2e} |")
        lines += ["", f"f32 gate: match_rate ≥ {F32_MATCH_RATE}, score_max ≤ {F32_SCORE_TOL}, "
                  f"box_max ≤ {F32_BOX_TOL}px — " + ("**PASS**" if not failures else
                  "**FAIL**: " + "; ".join(failures)), ""]
        with open(os.path.join(GOLDEN_DIR, "REPORT.md"), "w") as f:
            f.write("\n".join(lines))
        print(f"report -> {GOLDEN_DIR}/REPORT.md")

    if failures:
        print("PARITY FAILURES:\n" + "\n".join(failures))
        sys.exit(1)
    print("full-scale parity OK")


if __name__ == "__main__":
    main()
