"""Fixture tests for the dataset metric CLIs, asserting the REFERENCE
formulas (implemented inline here from the reference sources) against the
repo tools: PanNuke empty-GT→NaN semantics
(reference tools/analysis_tools/pannuke/compute_stats.py:103-120 and the
per-tissue Average aggregation :155-176), the CoNSeP HoVer-Net weighted Fc
(reference consep/compute_stats.py:116-145), and the CoNIC multiclass R²
(reference conic/metrics/stats_utils.py:179-215)."""

import importlib.util
import os
import sys

import numpy as np
import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools", "analysis_tools")


def _load(relpath, name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(TOOLS, relpath)
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _disk(h, w, cy, cx, r):
    yy, xx = np.mgrid[:h, :w]
    return (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r


def _pannuke_img(instances):
    """instances: list of (class_idx, cy, cx, r, inst_id). → (64, 64, 6)."""
    arr = np.zeros((64, 64, 6), np.int32)
    for c, cy, cx, r, iid in instances:
        arr[_disk(64, 64, cy, cx, r), c] = iid
    return arr


class TestPanNuke:
    def test_empty_gt_is_nan_even_with_predictions(self):
        pk = _load("pannuke/compute_stats.py", "pannuke_stats")
        # img0: GT empty, pred has one nucleus → NaN (NOT 0)
        # img1: identical GT/pred single nucleus → bPQ = 1
        t = [_pannuke_img([]), _pannuke_img([(0, 32, 32, 6, 1)])]
        p = [_pannuke_img([(0, 20, 20, 5, 1)]), _pannuke_img([(0, 32, 32, 6, 1)])]
        res = pk.compute_stats(t, p)
        # nanmean skips img0 entirely: bPQ == img1's perfect 1.0
        np.testing.assert_allclose(res["bPQ"], 1.0, atol=1e-5)
        np.testing.assert_allclose(res["PQ_class_0"], 1.0, atol=1e-5)
        # classes with no GT anywhere stay NaN
        assert np.isnan(res["PQ_class_3"])

    def test_empty_gt_class_is_nan_with_pred_in_class(self):
        pk = _load("pannuke/compute_stats.py", "pannuke_stats")
        # GT has class 0 only; pred adds a spurious class-1 nucleus.
        # Reference: class-1 PQ is NaN (GT empty for that class), and the
        # per-image mPQ ignores it — it does NOT drag mPQ down.
        t = [_pannuke_img([(0, 32, 32, 6, 1)])]
        p = [_pannuke_img([(0, 32, 32, 6, 1), (1, 12, 12, 4, 1)])]
        res = pk.compute_stats(t, p)
        assert np.isnan(res["PQ_class_1"])
        np.testing.assert_allclose(res["mPQ"], 1.0, atol=1e-5)
        # binary PQ DOES see the spurious nucleus (false positive)
        assert res["bPQ"] < 1.0

    def test_tissue_average_matches_reference_aggregation(self):
        pk = _load("pannuke/compute_stats.py", "pannuke_stats")
        rng = np.random.RandomState(0)
        imgs_t, imgs_p = [], []
        for i in range(4):
            inst = [(rng.randint(0, 5), rng.randint(10, 54), rng.randint(10, 54), 5, 1)]
            imgs_t.append(_pannuke_img(inst))
            # predictions: same nucleus shifted by i pixels
            c, cy, cx, r, iid = inst[0]
            imgs_p.append(_pannuke_img([(c, cy + i, cx, r, iid)]))
        types = np.asarray(["Breast", "Breast", "Colon", "Colon"])
        res = pk.compute_stats(imgs_t, imgs_p, types=types)

        # inline reference aggregation: Average = nanmean over the per-tissue
        # nanmeans of the per-image values (ref :155-176)
        res_no_types = pk.compute_stats(imgs_t, imgs_p)
        assert set(k for k in res if k.startswith("mPQ_")) == {"mPQ_Breast", "mPQ_Colon"}
        np.testing.assert_allclose(
            res["bPQ"], np.nanmean([res["bPQ_Breast"], res["bPQ_Colon"]])
        )
        np.testing.assert_allclose(
            res["mPQ"], np.nanmean([res["mPQ_Breast"], res["mPQ_Colon"]])
        )
        # equal-sized tissues here ⇒ equals the plain image mean
        np.testing.assert_allclose(res["mPQ"], res_no_types["mPQ"])


class TestCoNSePWeightedFc:
    def _mat(self, path, cents, types_):
        from scipy import io as sio

        sio.savemat(path, {
            "inst_centroid": np.asarray(cents, np.float32).reshape(-1, 2),
            "inst_type": np.asarray(types_, np.int32).reshape(-1, 1),
        })

    def test_weighted_fc_matches_inline_reference_formula(self, tmp_path):
        cs = _load("consep/compute_stats.py", "consep_stats")
        td, pd_ = tmp_path / "true", tmp_path / "pred"
        td.mkdir(), pd_.mkdir()
        # image A: 3 GT (types 1,1,2) / 3 preds at same coords (types 1,2,2)
        #   → paired with one type-1↔2 confusion
        # image B: 2 GT (types 2,3), preds: one matching (type 3), one
        #   spurious just outside radius 12 of GT0 (type 1) → one unpaired
        #   GT (type 2), one unpaired pred (the Hungarian assignment puts
        #   GT0 with the 14-px pred, which the radius filter then drops)
        self._mat(td / "a.mat", [[10, 10], [30, 30], [50, 50]], [1, 1, 2])
        self._mat(pd_ / "a.mat", [[11, 10], [30, 31], [50, 50]], [1, 2, 2])
        self._mat(td / "b.mat", [[10, 10], [40, 40]], [2, 3])
        self._mat(pd_ / "b.mat", [[40, 41], [10, 24]], [3, 1])

        results = cs.run_nuclei_type_stat(str(pd_) + os.sep, str(td) + os.sep)
        f1_d, acc_type = results[0], results[1]
        uid_list = [1, 2, 3]
        f1_types = dict(zip(uid_list, results[2:]))

        # --- inline reference formulas (consep/compute_stats.py:116-160) ---
        paired_true = np.array([1, 1, 2, 3])
        paired_pred = np.array([1, 2, 2, 3])
        unpaired_true = np.array([2])
        unpaired_pred = np.array([1])

        tp_d = len(paired_true)
        exp_f1_d = 2 * tp_d / (2 * tp_d + len(unpaired_pred) + len(unpaired_true))
        np.testing.assert_allclose(f1_d, exp_f1_d)
        exp_acc = (paired_true == paired_pred).sum() / len(paired_true)
        np.testing.assert_allclose(acc_type, exp_acc)

        w = [2, 2, 1, 1]
        for t in uid_list:
            sel = (paired_true == t) | (paired_pred == t)
            pt, pp = paired_true[sel], paired_pred[sel]
            tp_dt = ((pt == t) & (pp == t)).sum()
            tn_dt = ((pt != t) & (pp != t)).sum()
            fp_dt = ((pt != t) & (pp == t)).sum()
            fn_dt = ((pt == t) & (pp != t)).sum()
            fp_d = (unpaired_pred == t).sum()
            fn_d = (unpaired_true == t).sum()
            exp = (2 * (tp_dt + tn_dt)) / (
                2 * (tp_dt + tn_dt)
                + w[0] * fp_dt + w[1] * fn_dt + w[2] * fp_d + w[3] * fn_d
            )
            np.testing.assert_allclose(f1_types[t], exp, err_msg=f"type {t}")
        # sanity: the weighted Fc differs from a plain tp/fp/fn F1 here
        plain_f1_type1 = 2 * 1 / (2 * 1 + 1 + 1)  # tp=1 (a), fp=1 (b spur), fn=1 (a conf)
        assert abs(f1_types[1] - plain_f1_type1) > 1e-6

    def test_empty_pred_image_contributes_dummy(self, tmp_path):
        cs = _load("consep/compute_stats.py", "consep_stats")
        td, pd_ = tmp_path / "true", tmp_path / "pred"
        td.mkdir(), pd_.mkdir()
        self._mat(td / "a.mat", [[10, 10]], [1])
        self._mat(pd_ / "a.mat", np.zeros((0, 2)), np.zeros((0, 1)))
        # reference :57-60/:72-77: empty side becomes one dummy instance at
        # (0,0) with type 0 — runs without error
        results = cs.run_nuclei_type_stat(str(pd_) + os.sep, str(td) + os.sep)
        assert np.isfinite(results[0])


class TestCoNICR2:
    def test_multi_r2_matches_inline_formula(self):
        import pandas as pd

        conic = _load("conic/compute_stats.py", "conic_stats")
        rng = np.random.RandomState(1)
        cols = conic.CONIC_CLASSES
        true = pd.DataFrame({c: rng.randint(0, 30, 10) for c in cols})
        pred = pd.DataFrame(
            {c: np.maximum(true[c] + rng.randint(-3, 4, 10), 0) for c in cols}
        )
        got = conic.get_multi_r2(true, pred)
        exp = np.mean([
            1.0
            - np.sum((true[c].values - pred[c].values) ** 2.0)
            / np.sum((true[c].values - true[c].values.mean()) ** 2.0)
            for c in cols
        ])
        np.testing.assert_allclose(got, exp)

    def test_multi_r2_rejects_unknown_columns(self):
        import pandas as pd

        conic = _load("conic/compute_stats.py", "conic_stats")
        df = pd.DataFrame({"epithelial": [1], "bogus": [2]})
        with pytest.raises(ValueError):
            conic.get_multi_r2(df, df)

    def test_seg_class_includes_aji_dice(self):
        conic = _load("conic/compute_stats.py", "conic_stats")
        img = np.zeros((64, 64, 2), np.int32)
        img[_disk(64, 64, 20, 20, 6), 0] = 1
        img[_disk(64, 64, 45, 45, 5), 0] = 2
        img[..., 1] = np.where(img[..., 0] > 0, 1, 0)  # all class 1
        res = conic.seg_class_stats([img], [img], num_classes=6)
        for k in ("pq", "aji", "aji_plus", "dice"):
            np.testing.assert_allclose(res[k], 1.0, atol=1e-5, err_msg=k)
        # multi-PQ+ pools classes over the dataset: class 1 perfect, the
        # other 5 classes have tp=fp=fn=0 → dq·sq = 0 (reference :125-143)
        np.testing.assert_allclose(res["pq+_per_class"][0], 1.0, atol=1e-5)
        np.testing.assert_allclose(res["multi_pq+"], 1.0 / 6.0, atol=1e-5)
