"""VLM (LLaVA) stack tests: vision tower, projector, splicing, prompts,
multimodal forward/generate, and the LLaVA GPTQ driver (tiny configs).

Reference parity notes cited per-test (vlm/llava/*)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microscopiq_tpu.vlm import (CLIPVisionConfig, CLIPVisionTower,
                                 IMAGE_TOKEN_INDEX, LlavaConfig,
                                 LlavaForCausalLM, VisionProjector,
                                 conv_templates, eval_vqa,
                                 expand_image_tokens, generate_mm,
                                 llava_sequential, process_images,
                                 split_list, tokenizer_image_token)
from microscopiq_tpu.vlm.llava import splice_image_features


class FakeTokenizer:
    bos_token_id = 1
    eos_token_id = 2

    def encode(self, s):
        return [1] + [3 + (ord(c) % 50) for c in s]

    def decode(self, ids):
        return " ".join(str(i) for i in ids)


def test_vision_tower_shapes():
    cfg = CLIPVisionConfig.tiny()  # 16px image, 8px patch → 4 patches
    tower = CLIPVisionTower(cfg)
    pix = jnp.ones((2, cfg.image_size, cfg.image_size, 3))
    params = tower.init(jax.random.PRNGKey(0), pix)
    feats = tower.apply(params, pix)
    # select_feature='patch' drops CLS (clip_encoder.py:41-45)
    assert feats.shape == (2, cfg.num_patches, cfg.hidden_size)


def test_vision_tower_cls_patch():
    cfg = CLIPVisionConfig.tiny()
    tower = CLIPVisionTower(cfg, select_feature="cls_patch")
    pix = jnp.ones((1, cfg.image_size, cfg.image_size, 3))
    params = tower.init(jax.random.PRNGKey(0), pix)
    assert tower.apply(params, pix).shape == (1, cfg.num_patches + 1,
                                              cfg.hidden_size)


@pytest.mark.parametrize("ptype,depth", [("linear", 1),
                                         ("mlp2x_gelu", 2),
                                         ("mlp3x_gelu", 3)])
def test_projector(ptype, depth):
    proj = VisionProjector(24, ptype)
    x = jnp.ones((2, 5, 16))
    params = proj.init(jax.random.PRNGKey(0), x)
    assert len(params["params"]) == depth
    assert proj.apply(params, x).shape == (2, 5, 24)


def test_splice_image_features_order():
    """Slot j receives image feature cumsum(mask)-1 — order-preserving
    splice (llava_arch.py:145-324 semantics, static-shape version)."""
    B, S, T, D = 2, 7, 3, 4
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
    img = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    mask = np.zeros((B, S), bool)
    mask[0, 1:4] = True   # contiguous slots
    mask[1, [0, 3, 6]] = True  # scattered slots
    out = np.asarray(splice_image_features(text, img,
                                           jnp.asarray(mask)))
    want = np.asarray(text).copy()
    for b in range(B):
        want[b, mask[b]] = np.asarray(img)[b]
    np.testing.assert_allclose(out, want, rtol=0, atol=0)


def test_tokenizer_image_token_and_expand():
    tok = FakeTokenizer()
    ids = tokenizer_image_token("hi <image> there", tok)
    assert ids.count(IMAGE_TOKEN_INDEX) == 1
    # BOS of the post-image chunk is stripped (mm_utils.py:49-66)
    assert ids.count(tok.bos_token_id) == 1
    exp, mask = expand_image_tokens(ids, 4)
    assert mask.sum() == 4 and len(exp) == len(ids) - 1 + 4
    # left-padding
    exp2, mask2 = expand_image_tokens(ids, 4, pad_to=len(exp) + 3)
    assert len(exp2) == len(exp) + 3 and not mask2[:3].any()
    with pytest.raises(ValueError):
        expand_image_tokens(ids, 4, pad_to=2)


def test_conversation_prompt():
    conv = conv_templates["llava_v1"].copy()
    conv.append_message(conv.roles[0], "<image>\nWhat is this?")
    conv.append_message(conv.roles[1], None)
    p = conv.get_prompt()
    assert p.startswith("A chat between")
    assert "USER: <image>\nWhat is this? ASSISTANT:" in p
    assert not conv_templates["llava_v1"].messages  # copy() isolates


def test_process_images():
    img = (np.random.default_rng(0).uniform(0, 255, (20, 12, 3))
           .astype(np.uint8))
    out = process_images([img], 16)
    assert out.shape == (1, 16, 16, 3) and out.dtype == np.float32
    # padded region is the CLIP mean → exactly 0 after normalization
    assert abs(out[0, 8, 0, 0]) < 1e-5


def test_split_list():
    assert split_list(list(range(10)), 3) == [[0, 1, 2, 3],
                                              [4, 5, 6, 7], [8, 9]]


def _tiny_llava():
    cfg = LlavaConfig.tiny()
    model = LlavaForCausalLM(cfg, use_pallas=False)
    S = 12
    T = cfg.num_image_tokens
    ids = np.zeros((1, S), np.int32)
    ids[0, :3] = [1, 5, 9]
    ids[0, 3 + T:] = 7
    mask = np.zeros((1, S), bool)
    mask[0, 3:3 + T] = True
    pix = np.random.default_rng(1).normal(
        size=(1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                        pixel_values=jnp.asarray(pix),
                        image_token_mask=jnp.asarray(mask))
    return cfg, model, params, ids, mask, pix


def test_llava_forward_and_image_sensitivity():
    cfg, model, params, ids, mask, pix = _tiny_llava()
    logits = model.apply(params, jnp.asarray(ids),
                         pixel_values=jnp.asarray(pix),
                         image_token_mask=jnp.asarray(mask))
    assert logits.shape == (1, ids.shape[1], cfg.text.vocab_size)
    logits2 = model.apply(params, jnp.asarray(ids),
                          pixel_values=jnp.asarray(pix * 2.0),
                          image_token_mask=jnp.asarray(mask))
    assert not np.allclose(np.asarray(logits[:, -1]),
                           np.asarray(logits2[:, -1]))
    # text-only path still works (decode steps pass no pixels)
    lt = model.apply(params, jnp.asarray(ids))
    assert lt.shape == logits.shape


def test_generate_mm():
    cfg, model, params, ids, mask, pix = _tiny_llava()
    out = generate_mm(model, params, ids, mask, pix, max_new_tokens=5)
    assert out.shape == (1, 5) and out.dtype == np.int32
    # greedy decode is deterministic
    out2 = generate_mm(model, params, ids, mask, pix, max_new_tokens=5)
    np.testing.assert_array_equal(out, out2)


def test_llava_sequential_gptq():
    cfg, model, params, ids, mask, pix = _tiny_llava()
    n = 2
    ids_n = np.repeat(ids, n, 0)
    mask_n = np.repeat(mask, n, 0)
    pix_n = np.repeat(pix, n, 0)
    q = llava_sequential(model, params, jnp.asarray(ids_n),
                         jnp.asarray(mask_n), jnp.asarray(pix_n),
                         nsamples_batch=2, verbose=False)
    # vision tower untouched (vlm/llava.py:154-264 quantizes LM only)
    tv0 = jax.tree_util.tree_leaves(params["params"]["vision_tower"])
    tv1 = jax.tree_util.tree_leaves(q["params"]["vision_tower"])
    for a, b in zip(tv0, tv1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # LM kernels changed (quantized)
    k0 = params["params"]["model"]["layers_0"]["self_attn"]["q_proj"][
        "kernel"]
    k1 = q["params"]["model"]["layers_0"]["self_attn"]["q_proj"][
        "kernel"]
    assert not np.allclose(np.asarray(k0), np.asarray(k1))
    # quantized model still runs
    logits = model.apply(q, jnp.asarray(ids),
                         pixel_values=jnp.asarray(pix),
                         image_token_mask=jnp.asarray(mask))
    assert np.isfinite(np.asarray(logits)).all()


def test_eval_vqa_writes_jsonl(tmp_path):
    cfg, model, params, *_ = _tiny_llava()
    qs = [{"question_id": i, "image": f"im{i}", "text": "what?"}
          for i in range(2)]
    rng = np.random.default_rng(0)
    loader = lambda name: rng.uniform(0, 255, (18, 18, 3))
    f = tmp_path / "answers.jsonl"
    res = eval_vqa(model, params, FakeTokenizer(), qs, loader, str(f),
                   max_new_tokens=3)
    assert len(res) == 2
    import json
    lines = [json.loads(l) for l in f.read_text().splitlines()]
    assert lines[0]["question_id"] == 0 and "text" in lines[0]


def test_delta_roundtrip_with_vocab_growth(tmp_path):
    """make_delta/apply_delta must round-trip the LLaVA delta semantics
    (apply_delta.py:1-48): delta-only keys (mm_projector) pass through,
    and embed_tokens/lm_head rows grown by the image tokens add the base
    into the leading slab only."""
    import numpy as np

    from microscopiq_tpu.utils.checkpoint import (apply_delta,
                                                  load_checkpoint,
                                                  make_delta,
                                                  save_checkpoint)

    rng = np.random.default_rng(0)
    base = {
        "model": {
            "embed_tokens": rng.standard_normal((10, 4)).astype(np.float32),
            "layers_0": {"mlp": {"kernel":
                         rng.standard_normal((4, 4)).astype(np.float32)}},
        },
        "lm_head": {"kernel":
                    rng.standard_normal((4, 10)).astype(np.float32)},
    }
    target = {
        "model": {
            # vocab grown 10 -> 12 (image tokens)
            "embed_tokens": rng.standard_normal((12, 4)).astype(np.float32),
            "layers_0": {"mlp": {"kernel":
                         rng.standard_normal((4, 4)).astype(np.float32)}},
            "mm_projector": {"kernel":
                             rng.standard_normal((4, 4)).astype(np.float32)},
        },
        "lm_head": {"kernel":
                    rng.standard_normal((4, 12)).astype(np.float32)},
    }

    delta = make_delta(base, target)
    # projector stored verbatim
    np.testing.assert_array_equal(
        np.asarray(delta["model"]["mm_projector"]["kernel"]),
        target["model"]["mm_projector"]["kernel"])
    back = apply_delta(base, delta)
    for path in (("model", "embed_tokens"), ("lm_head", "kernel"),
                 ("model", "layers_0", "mlp", "kernel"),
                 ("model", "mm_projector", "kernel")):
        t, b = target, back
        for k in path:
            t, b = t[k], b[k]
        np.testing.assert_allclose(np.asarray(b), np.asarray(t),
                                   atol=1e-6)

    # CLI over checkpoint dirs
    from microscopiq_tpu.vlm.delta import main as delta_main

    save_checkpoint(str(tmp_path / "base"), base)
    save_checkpoint(str(tmp_path / "target"), target)
    delta_main(["make", "--base", str(tmp_path / "base"),
                "--target", str(tmp_path / "target"),
                "--delta", str(tmp_path / "delta")])
    delta_main(["apply", "--base", str(tmp_path / "base"),
                "--delta", str(tmp_path / "delta"),
                "--target", str(tmp_path / "target2")])
    t2 = load_checkpoint(str(tmp_path / "target2"))
    np.testing.assert_allclose(
        np.asarray(t2["model"]["embed_tokens"]),
        target["model"]["embed_tokens"], atol=1e-6)
    delta_main(["consolidate", "--src", str(tmp_path / "target2"),
                "--dst", str(tmp_path / "target3")])
    t3 = load_checkpoint(str(tmp_path / "target3"))
    np.testing.assert_allclose(np.asarray(t3["lm_head"]["kernel"]),
                               target["lm_head"]["kernel"], atol=1e-6)


def test_checkpoint_roundtrip_compact_transport(tmp_path):
    """PackedOutlierNB leaves survive save/load bit-exactly."""
    import numpy as np

    from microscopiq_tpu.ops.packing import (dequantize_outlier_nb,
                                             pack_outlier_nb)
    from microscopiq_tpu.quant import GPTQ, MXQuantizer
    from microscopiq_tpu.utils.checkpoint import (load_checkpoint,
                                                  save_checkpoint)
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    W = rng.standard_normal((64, 32)).astype(np.float32)
    g = GPTQ(jnp.asarray(W), mode="mx_prune")
    g.quantizer = MXQuantizer(8, 8, "int2", "fp4", std_dev=2.0, axes=(0,),
                              block_size=16, max_outliers_per_block=2)
    g.add_batch(jnp.asarray(rng.standard_normal((8, 32)).astype(np.float32)))
    g.fasterquant(blocksize=16, collect_decisions=True)
    p = pack_outlier_nb(g.decisions, budget=2)
    save_checkpoint(str(tmp_path / "ck"), {"layer": {"kernel": p}})
    back = load_checkpoint(str(tmp_path / "ck"))["layer"]["kernel"]
    np.testing.assert_array_equal(np.asarray(dequantize_outlier_nb(back)),
                                  np.asarray(dequantize_outlier_nb(p)))


def test_llava_mistral_variant():
    """Mistral-backed LLaVA (llava_mistral.py parity): sliding-window LM
    under the same multimodal arch; window actually bites (logits differ
    from the unwindowed Llama backbone on a long prompt)."""
    import dataclasses

    cfg = LlavaConfig.tiny_mistral()
    assert cfg.text.sliding_window == 8
    model = LlavaForCausalLM(cfg, use_pallas=False)
    S = 24
    T = cfg.num_image_tokens
    ids = np.full((1, S), 7, np.int32)
    ids[0, :3] = [1, 5, 9]
    mask = np.zeros((1, S), bool)
    mask[0, 3:3 + T] = True
    pix = np.random.default_rng(1).normal(
        size=(1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                        pixel_values=jnp.asarray(pix),
                        image_token_mask=jnp.asarray(mask))
    logits = model.apply(params, jnp.asarray(ids),
                         pixel_values=jnp.asarray(pix),
                         image_token_mask=jnp.asarray(mask))
    assert logits.shape == (1, S, cfg.text.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()

    # same weights, window removed -> different last-token logits
    cfg_nw = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, sliding_window=None))
    model_nw = LlavaForCausalLM(cfg_nw, use_pallas=False)
    logits_nw = model_nw.apply(params, jnp.asarray(ids),
                               pixel_values=jnp.asarray(pix),
                               image_token_mask=jnp.asarray(mask))
    assert not np.allclose(np.asarray(logits[:, -1]),
                           np.asarray(logits_nw[:, -1]))

    # generation works through the mm path
    out = generate_mm(model, params, ids, mask, pix, max_new_tokens=3)
    assert out.shape == (1, 3)


def test_llava_mpt_variant():
    """MPT-backed LLaVA (llava_mpt.py parity): ALiBi/LayerNorm/GELU LM
    with tied embeddings under the same multimodal arch; the tied lm_head
    means no separate lm_head leaf and image content moves the logits."""
    cfg = LlavaConfig.tiny_mpt()
    assert cfg.text.pos_emb == "alibi" and cfg.text.tie_word_embeddings
    model = LlavaForCausalLM(cfg, use_pallas=False)
    S = 24
    T = cfg.num_image_tokens
    ids = np.full((1, S), 7, np.int32)
    ids[0, :3] = [1, 5, 9]
    mask = np.zeros((1, S), bool)
    mask[0, 3:3 + T] = True
    pix = np.random.default_rng(1).normal(
        size=(1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                        pixel_values=jnp.asarray(pix),
                        image_token_mask=jnp.asarray(mask))
    assert "lm_head" not in params["params"]          # tied
    logits = model.apply(params, jnp.asarray(ids),
                         pixel_values=jnp.asarray(pix),
                         image_token_mask=jnp.asarray(mask))
    assert logits.shape == (1, S, cfg.text.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()
    # a different image must change the answer logits
    logits2 = model.apply(params, jnp.asarray(ids),
                          pixel_values=jnp.asarray(pix * -1.0),
                          image_token_mask=jnp.asarray(mask))
    assert not np.allclose(np.asarray(logits[:, -1]),
                           np.asarray(logits2[:, -1]))

    out = generate_mm(model, params, ids, mask, pix, max_new_tokens=3)
    assert out.shape == (1, 3)


def test_convert_hf_llava_mpt_layout():
    """convert_hf_llava must detect the transformer.blocks.* (MPT) layout
    and produce a tree the MPT-backed LlavaForCausalLM accepts."""
    import torch
    from transformers import MptConfig as HFMptConfig
    from transformers import MptForCausalLM as HFMpt

    from microscopiq_tpu.models import state_dict_from_torch_model
    from microscopiq_tpu.vlm.llava import convert_hf_llava

    cfg = LlavaConfig.tiny_mpt()
    tc = cfg.text
    hf_cfg = HFMptConfig(d_model=tc.hidden_size, n_heads=4, n_layers=2,
                         vocab_size=tc.vocab_size,
                         max_seq_len=tc.max_position_embeddings,
                         attn_implementation="eager")
    torch.manual_seed(0)
    hf = HFMpt(hf_cfg).eval()
    sd = state_dict_from_torch_model(hf)

    # graft tiny vision/projector weights under the MPT base module name
    model = LlavaForCausalLM(cfg, use_pallas=False)
    seed = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    vt = seed["params"]["vision_tower"]
    # flatten our CLIP tree back to HF names via the inverse mapping used
    # by the converter is overkill here; instead verify LM-side grafting
    # only: drop vision keys and convert, then splice seed vision params.
    params = convert_hf_llava(
        {k: v for k, v in sd.items()}, cfg,
        vision_params=vt, projector_params=seed["params"]["mm_projector"])
    ids = np.random.default_rng(3).integers(0, tc.vocab_size, (1, 6))
    with torch.no_grad():
        want = hf(torch.tensor(ids)).logits.numpy()
    got = np.asarray(model.apply({"params": params["params"]},
                                 jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_pope_evaluator(tmp_path):
    """POPE scorer reproduces the reference's normalization and metric
    math (eval_pope.py:5-80), end to end through the file CLI."""
    import json

    from microscopiq_tpu.vlm.evaluators import (eval_pope, eval_pope_files,
                                                normalize_pope_answer)

    assert normalize_pope_answer("Yes, there is a dog. It is red.") == "yes"
    assert normalize_pope_answer("No.") == "no"
    assert normalize_pope_answer("It is not there, sorry.") == "no"
    assert normalize_pope_answer("there is no dog") == "no"

    answers = [{"text": t} for t in
               ("Yes.", "No.", "Yes.", "not really", "Yes it is.")]
    labels = ["yes", "no", "no", "no", "yes"]
    m = eval_pope(answers, labels)
    assert (m["TP"], m["FP"], m["TN"], m["FN"]) == (2, 1, 2, 0)
    assert abs(m["f1"] - (2 * (2 / 3) * 1.0 / ((2 / 3) + 1.0))) < 1e-9
    assert m["yes_ratio"] == 3 / 5

    # file-level per-category flow
    ann = tmp_path / "ann"
    ann.mkdir()
    with open(ann / "coco_pope_popular.json", "w") as f:
        for l in labels:
            f.write(json.dumps({"label": l}) + "\n")
    with open(tmp_path / "questions.jsonl", "w") as f:
        for i in range(5):
            f.write(json.dumps({"question_id": i,
                                "category": "popular"}) + "\n")
    with open(tmp_path / "answers.jsonl", "w") as f:
        for i, a in enumerate(answers):
            f.write(json.dumps({"question_id": i, **a}) + "\n")
    scores = eval_pope_files(str(ann), str(tmp_path / "questions.jsonl"),
                             str(tmp_path / "answers.jsonl"))
    assert scores["popular"]["TP"] == 2


def test_scienceqa_evaluator(tmp_path):
    """ScienceQA scorer: the reference's answer-parsing ladder and the
    sqa_results schema (eval_science_qa.py:28-121)."""
    from microscopiq_tpu.vlm.evaluators import (eval_science_qa,
                                                parse_sqa_answer)

    opts = ["A", "B", "C", "D", "E"]
    assert parse_sqa_answer("B", opts) == "B"
    assert parse_sqa_answer("C. because physics", opts) == "C"
    assert parse_sqa_answer("I think The answer is D.", opts) == "D"
    assert parse_sqa_answer("no idea", opts) == "FAILED"

    problems = {
        "p1": {"choices": ["x", "y"], "answer": 1},
        "p2": {"choices": ["x", "y", "z"], "answer": 0},
        "p3": {"choices": ["x", "y"], "answer": 0},
    }
    predictions = {
        "p1": {"text": "B", "prompt": "<image>\nwhich?"},
        "p2": {"text": "The answer is C.", "prompt": "which?"},
        # p3 missing -> FAILED
    }
    results, sqa = eval_science_qa(predictions, problems,
                                   ["p1", "p2", "p3"], opts)
    assert sqa["correct"] == 1 and sqa["count"] == 3
    assert abs(sqa["acc"] - 100 / 3) < 1e-9
    assert sqa["img_acc"] == 100.0          # the only mm sample is right
    assert sqa["results"]["p2"] == 2 and sqa["results"]["p3"] == -1
    assert {r["question_id"] for r in results["incorrect"]} == {"p2", "p3"}


def _b64_png(rng, size=8):
    import base64
    import io

    from PIL import Image

    arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode(), arr


def test_mmbench_harness(tmp_path):
    """MMBench loop: TSV + base64 images, hint prepend, option rotation
    across rounds, direct-answer suffix, the reference answers-jsonl
    schema (model_vqa_mmbench.py:80-137), and rotation-aware scoring."""
    import csv
    import json

    from microscopiq_tpu.vlm.mmbench import (build_question, eval_mmbench,
                                             is_none, iter_rounds,
                                             load_mmbench_table,
                                             score_mmbench)

    assert is_none(float("nan")) and is_none("NaN") and is_none("none")
    assert not is_none("B")

    rng = np.random.default_rng(0)
    b64, arr = _b64_png(rng)
    rows = [
        {"index": "1", "question": "What color?", "hint": "Look closely.",
         "image": b64, "A": "red", "B": "blue", "C": "green", "D": "",
         "answer": "B", "category": "color"},
        {"index": "2", "question": "How many?", "hint": "nan",
         "image": b64, "A": "one", "B": "two", "C": "", "D": "",
         "answer": "A", "category": "count"},
    ]
    tsv = tmp_path / "q.tsv"
    with open(tsv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]), delimiter="\t")
        w.writeheader()
        w.writerows(rows)
    questions = load_mmbench_table(str(tsv))

    # hint prepended; empty option D dropped; suffix appended
    q = build_question(questions[0], ["red", "blue", "green"],
                       ["A", "B", "C"])
    assert q.startswith("Look closely.\nWhat color?")
    assert "\nB. blue" in q and "D." not in q
    assert q.endswith("directly.")
    # nan hint not prepended
    q2 = build_question(questions[1], ["one", "two"], ["A", "B"])
    assert q2.startswith("How many?")

    # rotation: round 1 shifts options AND letters circularly
    rounds = list(iter_rounds(questions[0], all_rounds=True))
    assert len(rounds) == 3
    assert rounds[0][1:] == (["red", "blue", "green"], ["A", "B", "C"])
    assert rounds[1][1:] == (["blue", "green", "red"], ["B", "C", "A"])

    seen_images = []

    def fake_answer(prompt, image):
        seen_images.append(image)
        return "B."          # always answers letter B

    ans_file = tmp_path / "answers.jsonl"
    recs = eval_mmbench(questions, fake_answer, str(ans_file),
                        all_rounds=True)
    assert len(recs) == 3 + 2
    with open(ans_file) as f:
        loaded = [json.loads(l) for l in f]
    assert loaded[0].keys() >= {"question_id", "round_id", "prompt",
                                "text", "options", "option_char",
                                "answer_id", "model_id", "metadata"}
    np.testing.assert_array_equal(seen_images[0], arr)

    # scoring honors rotation: "B" in round 0 = blue (right for q1),
    # in round 1 letters are [B,C,A] so "B" = blue again (first slot).
    s = score_mmbench(recs, questions)
    q1_right = sum(r["question_id"] == "1" and
                   r["options"][r["option_char"].index("B")] == "blue"
                   for r in recs)
    assert s["correct"] == q1_right      # q2's answer "one" never picked
    assert s["total"] == 5


def test_gpt_review_pipeline(tmp_path):
    """LLM-judge review: reference content assembly (plain + [Context]
    visual variant), score parsing, jsonl schema, and the summarizer's
    relative-score math (eval_gpt_review.py, summarize_gpt_review.py)."""
    import json

    from microscopiq_tpu.vlm.gpt_review import (build_review_content,
                                                parse_score, pick_rule,
                                                review_files,
                                                summarize_reviews)

    assert parse_score("8 6\nGood detail.") == [8.0, 6.0]
    assert parse_score("7, 9\nok") == [7.0, 9.0]
    assert parse_score("no scores here at all") == [-1, -1]

    rule = {"role": "Assistant", "prompt": "Rate both answers."}
    c = build_review_content({"text": "Q?"}, {"text": "A1"},
                             {"text": "A2"}, rule)
    assert c == ("[Question]\nQ?\n\n"
                 "[Assistant 1]\nA1\n\n[End of Assistant 1]\n\n"
                 "[Assistant 2]\nA2\n\n[End of Assistant 2]\n\n"
                 "[System]\nRate both answers.\n\n")
    ctx = {"captions": ["a cat"], "instances":
           [{"category": "cat", "bbox": [1, 2, 3, 4]}]}
    cv = build_review_content({"text": "Q?"}, {"text": "A1"},
                              {"text": "A2"}, rule, ctx)
    assert cv.startswith("[Context]\na cat\n\ncat: [1, 2, 3, 4]\n\n"
                         "[Question]")

    rules = {"default": rule, "detail": {"role": "R", "prompt": "p"}}
    assert pick_rule(rules, "detail")["role"] == "R"
    assert pick_rule(rules, "missing")["role"] == "Assistant"
    with pytest.raises(KeyError):
        pick_rule(rules, "missing", strict=True)

    # file-mode end to end with a deterministic fake judge
    def write_jsonl(path, recs):
        with open(path, "w") as f:
            for r in recs:
                f.write(json.dumps(r) + "\n")

    write_jsonl(tmp_path / "q.jsonl",
                [{"question_id": i, "text": f"q{i}", "category": "conv"}
                 for i in range(4)])
    write_jsonl(tmp_path / "a1.jsonl",
                [{"question_id": i, "answer_id": f"x{i}", "text": "one"}
                 for i in range(4)])
    write_jsonl(tmp_path / "a2.jsonl",
                [{"question_id": i, "answer_id": f"y{i}", "text": "two"}
                 for i in range(4)])
    with open(tmp_path / "rule.json", "w") as f:
        json.dump({"conv": rule, "default": rule}, f)

    reviews = review_files(str(tmp_path / "q.jsonl"),
                           [str(tmp_path / "a1.jsonl"),
                            str(tmp_path / "a2.jsonl")],
                           str(tmp_path / "rule.json"),
                           str(tmp_path / "out.jsonl"),
                           judge_fn=lambda content, mt: "8 6\nok")
    assert len(reviews) == 4
    assert reviews[0]["tuple"] == [8.0, 6.0]
    assert reviews[0]["answer1_id"] == "x0"
    with open(tmp_path / "out.jsonl") as f:
        assert len(f.readlines()) == 4

    table = summarize_reviews(reviews)
    # rel = 6/8*100 = 75.0, scores x10 = 80.0 / 60.0
    assert table["all"] == [75.0, 80.0, 60.0]
    assert table["conv"] == [75.0, 80.0, 60.0]


def test_textvqa_metrics(tmp_path):
    """EvalAI answer normalization + TextVQA 10-annotator soft accuracy,
    ST-VQA exact match and ANLS (m4c_evaluator.py parity — validated
    0/317 mismatches against the reference processor offline), plus the
    eval_textvqa.py prompt recovery and file join."""
    import json

    from microscopiq_tpu.vlm.textvqa import (EvalAIAnswerProcessor,
                                             STVQAAccuracyEvaluator,
                                             STVQAANLSEvaluator,
                                             TextVQAAccuracyEvaluator,
                                             eval_textvqa_files,
                                             prompt_processor)

    p = EvalAIAnswerProcessor()
    assert p("The Cat, isn't here?") == "cat isn't here"
    assert p("one hundred, two") == "1 hundred 2"
    assert p("youd think so") == "you'd think so"
    assert p("1,000 dollars") == "1000 dollars"
    assert p("(yes) [no]; \"maybe\"") == "yes no maybe"
    assert p("3.5 meters") == "3.5 meters"      # digit periods kept

    # soft accuracy: pred matches 3 of 10 annotators -> leave-one-out
    # average of min(1, matches/3)
    ev = TextVQAAccuracyEvaluator()
    entry = {"pred_answer": "cat",
             "gt_answers": ["cat", "cat", "cat"] + ["dog"] * 7}
    acc = ev.eval_pred_list([entry])
    # for 'cat': 7 gt entries see 3 matches (acc 1.0), 3 see 2 (2/3)
    assert abs(acc - (7 * 1.0 + 3 * (2 / 3)) / 10) < 1e-12

    sv = STVQAAccuracyEvaluator()
    assert sv.eval_pred_list([{"pred_answer": "a Cat",
                               "gt_answers": ["cat", "dog"]}]) == 1.0
    an = STVQAANLSEvaluator()
    assert abs(an.get_anls("hello", "helo") - 0.8) < 1e-12
    assert an.get_anls("hello", "xyz") == 0.0   # below the 0.5 floor

    # prompt variants (eval_textvqa.py:17-32)
    assert prompt_processor(
        "OCR tokens: a b Question: What is it? Short answer:") == \
        "what is it?"
    assert prompt_processor("What?\nReference OCR token: x\nanswer") == \
        "what?"
    assert prompt_processor("What color?\nShort answer:") == "what color?"

    ann = {"data": [{"image_id": "q1", "question": "What color?",
                     "answers": ["red"] * 10}]}
    with open(tmp_path / "ann.json", "w") as f:
        json.dump(ann, f)
    with open(tmp_path / "res.jsonl", "w") as f:
        f.write(json.dumps({"question_id": "q1",
                            "prompt": "What color?\nShort answer:",
                            "text": "Red."}) + "\n")
    out = eval_textvqa_files(str(tmp_path / "ann.json"),
                             str(tmp_path / "res.jsonl"))
    assert out == {"samples": 1, "accuracy": 1.0}


def test_eval_qa_harness(tmp_path):
    """Text-only QA loop (model_qa.py parity): conversation-templated
    prompts, answers-jsonl schema."""
    import json

    from microscopiq_tpu.vlm.evaluators import eval_qa

    questions = [{"question_id": i, "text": f"q{i}", "category": "misc"}
                 for i in range(3)]
    seen = []

    def fake(prompt):
        seen.append(prompt)
        return f"answer to {len(seen)}"

    out = eval_qa(questions, fake, str(tmp_path / "ans.jsonl"))
    assert len(out) == 3
    assert "USER: q0" in seen[0] and seen[0].rstrip().endswith("ASSISTANT:")
    with open(tmp_path / "ans.jsonl") as f:
        recs = [json.loads(l) for l in f]
    assert recs[1]["text"] == "answer to 2"
    assert recs[0].keys() >= {"question_id", "text", "answer_id",
                              "model_id", "metadata"}
