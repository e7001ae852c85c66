"""Model-scale accuracy-parity gate (VERDICT round-1 item 1).

The parity harness (scripts/parity_ref.py) runs the SAME weights and the
SAME calib/eval token streams through the reference torch pipeline
(/root/reference/llm/opt.py:25-252 + llm/gptq.py:60-184) and this repo's
(gptq_quantize_model + perplexity), and writes per-config perplexities.

These tests assert the committed report — and, when the local parity/
artifacts exist, the raw stage outputs — stay within the |delta ppl| <=
0.1 north-star gate (BASELINE.md). Regenerate with:

    python scripts/parity_ref.py prepare
    python scripts/parity_ref.py reference
    python scripts/parity_ref.py ours
    python scripts/parity_ref.py report
"""

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REPORT = os.path.join(REPO, "PARITY_r02.json")
ART = os.path.join(REPO, "parity")

GATE = 0.1


def test_committed_parity_report_passes():
    with open(REPORT) as f:
        rep = json.load(f)
    configs = rep["configs"]
    assert {"dense", "gptq_int2_fp4_block16", "rtn_mxfp6_block32"} <= set(configs)
    for name, c in configs.items():
        assert abs(c["ref_ppl"] - c["our_ppl"]) <= GATE, (name, c)
        assert c["pass"], (name, c)
        # the packed serving tree must track its fake-quant twin closely
        if "our_packed_ppl" in c:
            assert abs(c["our_packed_ppl"] - c["our_ppl"]) <= 0.05, (name, c)


def test_local_parity_artifacts_agree():
    ref_p = os.path.join(ART, "ref_results.json")
    our_p = os.path.join(ART, "our_results.json")
    if not (os.path.exists(ref_p) and os.path.exists(our_p)):
        pytest.skip("parity/ stage artifacts not present (see module docstring)")
    with open(ref_p) as f:
        ref = json.load(f)
    with open(our_p) as f:
        ours = json.load(f)
    pairs = [
        ("dense_ppl", "dense_ppl"),
        ("gptq_int2fp4_ppl", "gptq_int2fp4_ppl"),
        ("rtn_fp6_ppl", "rtn_fp6_ppl"),
    ]
    for rk, ok in pairs:
        assert abs(ref[rk] - ours[ok]) <= GATE, (rk, ref[rk], ours[ok])
