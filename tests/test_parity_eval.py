"""The real-weight parity runbook (scripts/parity_eval.py) must stay
executable while the published weights are unreachable: --dry_run feeds it
randomized state dicts in the exact published formats and runs every stage
(conversion audits, FID, PPL, LPIPS pairs) at toy scale.

Ref protocols: /root/reference/fid.py:54-55, /root/reference/ppl.py:102-107,
/root/reference/inception.py:13 (the weights URL this runbook unblocks)."""

import importlib.util
import json
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _load_script():
    path = os.path.join(REPO, "scripts", "parity_eval.py")
    spec = importlib.util.spec_from_file_location("parity_eval", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_parity_eval_dry_run(tmp_path):
    mod = _load_script()
    out = str(tmp_path / "parity.json")
    report = mod.main([
        "--dry_run", "--size", "64", "--batch", "4",
        "--n_fid", "12", "--n_ppl", "8", "--n_lpips_pairs", "4",
        "--out", out,
    ])
    # every stage produced a number, and the conversion audits pass with
    # the randomized weights (proving converter <-> mirror agreement is
    # weight-independent)
    assert report["audit_inception"]["ok"], report["audit_inception"]
    assert report["audit_vgg_lpips"]["ok"], report["audit_vgg_lpips"]
    import math

    assert math.isfinite(report["fid"]["value"])
    assert math.isfinite(report["ppl"]["value"])
    assert math.isfinite(report["lpips_fixed_pairs"]["mean"])
    with open(out) as f:
        assert json.load(f)["dry_run"] is True
