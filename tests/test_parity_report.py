"""Model-scale accuracy-parity gate (VERDICT round-1 item 1, scaled up
round 3 per VERDICT r2 item 6).

The parity harness (scripts/parity_ref.py) runs the SAME weights and the
SAME calib/eval token streams through the reference torch pipeline
(/root/reference/llm/opt.py:25-252 + llm/gptq.py:60-184 +
llm/llama.py:113-173 + utils/quant_model.py swap) and this repo's
(gptq_quantize_model + perplexity), and writes per-config perplexities.

Round-3 report: 12-layer hidden-512 OPT *and* Llama (GQA) models, 8
configs — dense, GPTQ int2+fp4/b16 (plain / act-order / g128+static
groups), RTN MXFP6/b32, direct activation quant (fp4 w + int4 a,
block 128, the reference MXLinear axes=[1] quirk incl. HF OPT's 2D
fc1/fc2 reshape), Llama dense + Llama GPTQ.

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
ART = os.path.join(REPO, "parity")

GATE = 0.1

R03_REQUIRED = {
    "dense", "gptq_int2_fp4_block16", "gptq_int2_fp4_block16_actorder",
    "gptq_int2_fp4_g128_static", "rtn_mxfp6_block32",
    "actquant_fp4w_int4a_block128", "llama_dense",
    "llama_gptq_int2_fp4_block16",
}


@pytest.mark.parametrize("report,required", [
    ("PARITY_r02.json", {"dense", "gptq_int2_fp4_block16",
                         "rtn_mxfp6_block32"}),
    ("PARITY_r03.json", R03_REQUIRED),
    ("PARITY_r05.json", R03_REQUIRED),
])
def test_committed_parity_report_passes(report, required):
    path = os.path.join(REPO, report)
    if not os.path.exists(path):
        pytest.skip(f"{report} not committed in this checkout")
    with open(path) as f:
        rep = json.load(f)
    configs = rep["configs"]
    assert required <= set(configs)
    assert rep["pass"]
    for name, c in configs.items():
        assert abs(c["ref_ppl"] - c["our_ppl"]) <= GATE, (name, c)
        assert c["pass"], (name, c)
        # the packed serving trees must track their fake-quant twin
        # closely (emi8m + r5's compact NB, which is decision-exact)
        for k in ("our_packed_ppl", "our_nb_packed_ppl"):
            if k in c:
                assert abs(c[k] - c["our_ppl"]) <= 0.05, (name, k, c)


def test_r05_report_new_arms():
    """r5 additions (VERDICT r4 ask #3): the NB compact-transport ppl
    arm and the H2O-quant-vs-dense-oracle arm at model scale."""
    path = os.path.join(REPO, "PARITY_r05.json")
    if not os.path.exists(path):
        pytest.skip("PARITY_r05.json not committed in this checkout")
    with open(path) as f:
        rep = json.load(f)
    c = rep["configs"]["gptq_int2_fp4_block16"]
    # uncapped NB: decision-exact vs the fake-quant twin (parity arm)
    assert "our_nb_packed_ppl" in c
    assert abs(c["our_nb_packed_ppl"] - c["our_ppl"]) <= 0.05
    # capped NB (the shipping config): exactness AND the ~4-bit budget
    cap = c["cap2"]
    assert abs(cap["nb_packed_ppl"] - cap["fake_ppl"]) <= 0.05
    assert cap["bits_per_element"] <= 4.5
    assert rep["h2o_quant"]["agreement"] >= 0.9
    assert rep["h2o_quant"]["pass"]


def test_r03_report_covers_required_knobs():
    """act-order, static groups+groupsize, activation quant, and a
    second architecture (Llama GQA) are each exercised (VERDICT r2
    item 6's explicit list)."""
    with open(os.path.join(REPO, "PARITY_r03.json")) as f:
        rep = json.load(f)
    assert len(rep["configs"]) >= 6
    m = rep["model"]
    assert m["opt"]["num_hidden_layers"] >= 12
    assert m["opt"]["hidden_size"] >= 512
    assert m["llama"]["num_key_value_heads"] < m["llama"]["num_attention_heads"]


def test_local_parity_artifacts_agree():
    ref_p = os.path.join(ART, "ref_results.json")
    our_p = os.path.join(ART, "our_results.json")
    if not (os.path.exists(ref_p) and os.path.exists(our_p)):
        pytest.skip("parity/ stage artifacts not present (see module docstring)")
    with open(ref_p) as f:
        ref = json.load(f)
    with open(our_p) as f:
        ours = json.load(f)
    for key in set(ref) & set(ours):
        assert abs(ref[key] - ours[key]) <= GATE, (key, ref[key], ours[key])
