"""Full-scale parity harness tests (VERDICT round-2 #2).

- the vectorized numpy RoIAlign oracle equals the proven scalar one
- torch_oracle.oracle_full_forward (backbone INCLUDED, watershed ON) equals
  the JAX detector end-to-end at tiny dims — certifying the harness that
  tools/misc/full_scale_parity.py runs at the real 512² Swin-T scale
- opt-in (NUHTC_FULLSCALE=1): the real-architecture graph vs the committed
  demo-image goldens in tests/goldens/full_scale/
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_roi_align_np_matches_scalar_ref():
    from test_ops_roi_align import roi_align_ref
    from torch_oracle import roi_align_np

    rng = np.random.RandomState(3)
    feat = rng.randn(3, 24, 32).astype(np.float32)
    rois = np.array(
        [[4.0, 4.0, 20.0, 16.0],
         [0.0, 0.0, 31.0, 23.0],
         [10.5, 3.2, 14.9, 9.8],
         [-2.0, -2.0, 5.0, 5.0],
         [1.0, 2.0, 120.0, 90.0]],  # adaptive: large roi → big grid
        np.float32,
    )
    for sr in (2, 0):
        want = roi_align_ref(feat, rois, 0.25, 7, sr)
        got = roi_align_np(feat, rois, 0.25, 7, sr)
        # 2e-6 reassociation delta: the scalar ref accumulates per sample
        # point, the vectorized version reduces corner products separately
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def _tiny_arch():
    from torch_oracle import OracleArch

    return OracleArch(
        embed_dims=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
        fpn_c=16, fc=256, img_hw=64, nms_pre=48, rpn_max=24, min_bs=2.0,
        score_thr=0.05, max_det=16, cand=256, ws_max=32, ws_min_area=2,
    )


def test_oracle_full_forward_matches_model_tiny():
    """End-to-end (backbone + watershed INCLUDED — the composed parity test
    bypasses both) at 64², tiny dims. Certifies the full-scale harness."""
    from nuhtc_tpu.models.detector import NuHTC
    from torch_oracle import apply_sd, build_full_sd, match_detections, oracle_full_forward

    a = _tiny_arch()
    rng = np.random.RandomState(7)
    sd = build_full_sd(rng, a)
    img = rng.rand(1, a.img_hw, a.img_hw, 3).astype(np.float32) * 2 - 1

    model = NuHTC(
        num_classes=a.nc, fpn_channels=a.fpn_c, strides=a.strides,
        rpn_nms_pre=a.nms_pre, rpn_max_per_img=a.rpn_max, rpn_nms_iou=a.rpn_iou,
        rpn_min_bbox_size=a.min_bs, rcnn_score_thr=a.score_thr,
        rcnn_nms_iou=a.rcnn_iou, rcnn_max_per_img=a.max_det,
        nms_candidates=a.cand, watershed_proposal=True, watershed_max=a.ws_max,
        watershed_min_area=a.ws_min_area, scale_factor=a.scale,
        exact_rois=True, dtype=jnp.float32,
        backbone_cfg=dict(embed_dims=a.embed_dims, depths=a.depths,
                          num_heads=a.num_heads, window_size=a.window,
                          drop_path_rate=0.0),
    )
    template = model.init(jax.random.PRNGKey(0), jnp.asarray(img), method="init_forward")
    params = apply_sd(sd, template)
    with jax.default_matmul_precision("float32"):
        out = model.apply(params, jnp.asarray(img))
    out = {k: np.asarray(v[0]) for k, v in out.items()}
    v = out["valid"].astype(bool)
    got = dict(boxes=out["boxes"][v], scores=out["scores"][v],
               labels=out["labels"][v], probs=out["probs"][v],
               mask_probs=out["mask_probs"][v])

    want = oracle_full_forward(sd, img, a)
    assert len(want["scores"]) > 0, "oracle produced no detections — reseed"

    pairs, un_got, un_want = match_detections(got, want, iou_thr=0.5)
    assert len(un_want) == 0 and len(un_got) == 0, (
        f"detection sets differ: {len(un_want)} golden unmatched, "
        f"{len(un_got)} extra (of {len(want['scores'])})")
    gi = np.asarray([p[0] for p in pairs])
    wi = np.asarray([p[1] for p in pairs])
    np.testing.assert_allclose(got["scores"][gi], want["scores"][wi], rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(got["boxes"][gi], want["boxes"][wi], rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(got["probs"][gi], want["probs"][wi], rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(got["mask_probs"][gi], want["mask_probs"][wi],
                               rtol=2e-3, atol=2e-3)


@pytest.mark.skipif(not os.environ.get("NUHTC_FULLSCALE"),
                    reason="slow (~15 min); set NUHTC_FULLSCALE=1 to run")
def test_full_scale_goldens_f32():
    """Real architecture (512² Swin-T, watershed ON) vs committed goldens."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools", "misc"))
    import full_scale_parity as fsp
    from torch_oracle import OracleArch, apply_sd, build_full_sd
    from nuhtc_tpu.data.pipelines import preprocess_test_image

    names, imgs = fsp.load_demo_images()
    if not imgs:
        pytest.skip("reference demo images unavailable")
    arch = OracleArch()
    sd = build_full_sd(np.random.RandomState(fsp.SEED), arch)
    imgs_prep = [np.asarray(preprocess_test_image(im, arch.scale)) for im in imgs]

    model = fsp.build_model(jnp.float32, exact=True)
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 512, 512, 3), jnp.float32),
                          method="init_forward")
    params = apply_sd(sd, template)
    got = fsp.run_jax(params, imgs_prep, jnp.float32, exact=True)
    for name, g in zip(names, got):
        path = os.path.join(fsp.GOLDEN_DIR, f"{name}.npz")
        assert os.path.exists(path), f"golden missing: {path}"
        z = np.load(path)
        want = {k: z[k] for k in z.files}
        want["mask_probs"] = want["mask_probs"].astype(np.float32)
        st = fsp.compare_one(g, want)
        assert st["match_rate"] >= fsp.F32_MATCH_RATE, (name, st)
        assert st.get("score_max", 0) <= fsp.F32_SCORE_TOL, (name, st)
        assert st.get("box_max", 0) <= fsp.F32_BOX_TOL, (name, st)
