"""Full-stack regression against the committed golden (VERDICT round-2 #7).

Runs the entire synthetic-PanNuke chain — preprocess → train → orbax ckpt →
tools/test.py metric suite → pannuke PQ CLI → WSI inference → nuclei_merge →
wsi_feat_extract — via tools/misc/run_e2e_golden.py (each stage a real CLI
subprocess) and compares the distilled summary to tests/goldens/
e2e_synthetic.json. Any silent behavior drift anywhere in the stack (data
pipeline, assigners, NMS, RLE, export formats, feature columns) changes the
summary and fails here.

Opt-in (spawns ~8 jax subprocesses, ~10 min on one CPU core):
  NUHTC_E2E=1 JAX_PLATFORMS=cpu python -m pytest tests/test_e2e_regression.py -q
Refresh the golden after an INTENTIONAL behavior change:
  JAX_PLATFORMS=cpu python tools/misc/run_e2e_golden.py --out tests/goldens/e2e_synthetic.json
"""

import json
import os
import sys

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("NUHTC_E2E"),
    reason="slow full-stack chain; set NUHTC_E2E=1 to run",
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools", "misc"))


def test_e2e_chain_matches_golden(tmp_path):
    from run_e2e_golden import GOLDEN, build_chain, compare

    summary = build_chain(str(tmp_path / "work"))
    with open(GOLDEN) as f:
        want = json.load(f)
    errs = compare(summary, want)
    assert not errs, "\n".join(errs)
