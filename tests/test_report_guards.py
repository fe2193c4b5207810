"""Degenerate-run guards for the report-writing tools (VERDICT r4 item 5).

Every tool that writes a success-shaped artifact (bf16_pq_experiment,
full_scale_parity, bench_sweep) must refuse to do so from a degenerate run —
zero detections, zero golden detections, or a 0-tiles/s bench row — instead
of shipping a null result as a deliverable (the round-4 BF16_PQ_REPORT.md
failure mode).
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

MISC = os.path.join(os.path.dirname(__file__), "..", "tools", "misc")
ATOOLS = os.path.join(os.path.dirname(__file__), "..", "tools", "analysis_tools")


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_bf16_pq_zero_detection_guard():
    mod = _load(os.path.join(MISC, "bf16_pq_experiment.py"), "bf16_pq_experiment")
    ok = {"_n_detections": 5}
    mod.check_nondegenerate(ok, ok)  # non-degenerate passes
    with pytest.raises(SystemExit, match="degenerate"):
        mod.check_nondegenerate({"_n_detections": 0}, ok)
    with pytest.raises(SystemExit, match="degenerate"):
        mod.check_nondegenerate(ok, {"_n_detections": 0})


def test_bf16_pq_family_matches_lowercase_eval_keys():
    """The round-4 headline was nan because the filter matched 'PQ' against the
    lowercase keys evaluate_dataset actually emits (pq, multi_pq, aji, ...)."""
    mod = sys.modules.get("bf16_pq_experiment") or _load(
        os.path.join(MISC, "bf16_pq_experiment.py"), "bf16_pq_experiment")
    emitted = ["aji", "aji_plus", "dice", "dq", "sq", "pq",
               "multi_pq", "multi_pq+", "multi_pq_0", "multi_pq+_3"]
    assert all(mod.pq_family(k) for k in emitted)
    assert not mod.pq_family("bbox_mAP")
    assert not mod.pq_family("confusion_matrix")


def test_full_scale_parity_vacuous_golden_guard():
    mod = _load(os.path.join(MISC, "full_scale_parity.py"), "full_scale_parity")
    empty = {"a": {"boxes": np.zeros((0, 4), np.float32)},
             "b": {"boxes": np.zeros((0, 4), np.float32)}}
    with pytest.raises(SystemExit, match="vacuous"):
        mod.assert_nonvacuous_goldens(empty)
    nonempty = {"a": {"boxes": np.zeros((3, 4), np.float32)}}
    mod.assert_nonvacuous_goldens(nonempty)


def test_bench_sweep_degenerate_value_marks_error(tmp_path, monkeypatch):
    mod = _load(os.path.join(ATOOLS, "bench_sweep.py"), "bench_sweep")

    class FakeProc:
        returncode = 0
        stdout = '{"metric": "tiles_per_sec", "value": 0, "unit": "tiles/s"}\n'

    monkeypatch.setattr(mod.subprocess, "run", lambda *a, **k: FakeProc())
    monkeypatch.setattr(mod, "REPO", str(tmp_path))
    monkeypatch.chdir(tmp_path)
    # redirect the jsonl append away from /tmp
    monkeypatch.setattr(
        "builtins.open",
        (lambda _orig: (lambda p, *a, **k: _orig(
            str(tmp_path / "sweep.jsonl") if str(p).startswith("/tmp/") else p,
            *a, **k)))(open),
    )
    rec = mod.run_one("default", {})
    assert "error" in rec and "degenerate" in rec["error"]


def test_bench_sweep_keeps_parent_pythonpath(tmp_path, monkeypatch):
    """Dropping the parent PYTHONPATH unregisters the axon TPU plugin in the
    child bench.py (ADVICE r4 medium)."""
    mod = _load(os.path.join(ATOOLS, "bench_sweep.py"), "bench_sweep")
    seen = {}

    class FakeProc:
        returncode = 0
        stdout = '{"metric": "tiles_per_sec", "value": 100.0, "unit": "tiles/s"}\n'

    def fake_run(cmd, env=None, **k):
        seen["env"] = env
        return FakeProc()

    monkeypatch.setattr(mod.subprocess, "run", fake_run)
    monkeypatch.setenv("PYTHONPATH", "/root/.axon_site")
    monkeypatch.setattr(
        "builtins.open",
        (lambda _orig: (lambda p, *a, **k: _orig(
            str(tmp_path / "sweep.jsonl") if str(p).startswith("/tmp/") else p,
            *a, **k)))(open),
    )
    rec = mod.run_one("default", {})
    assert "error" not in rec
    pp = seen["env"]["PYTHONPATH"].split(os.pathsep)
    assert mod.REPO in pp and "/root/.axon_site" in pp
