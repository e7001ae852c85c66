"""Tests for VQ quantizer, profilers, and packed-checkpoint IO."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microscopiq_tpu.quant.vq import VQQuantizer, get_assignments, kmeans_vq
from microscopiq_tpu.utils import (
    analyze_outliers,
    format_mse_profile,
    profile_model_outliers,
)
from microscopiq_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

RNG = np.random.default_rng(11)


def test_kmeans_recovers_clusters():
    centers = np.array([[0, 0], [5, 5], [-5, 5], [5, -5]], np.float32)
    X = np.concatenate([c + 0.1 * RNG.standard_normal((64, 2))
                        for c in centers]).astype(np.float32)
    cents, assign = kmeans_vq(jnp.asarray(X), 4, iters=12)
    # every recovered centroid is near a true center
    d = np.abs(np.asarray(cents)[:, None, :] - centers[None]).sum(-1).min(1)
    assert (d < 0.5).all(), d


def test_weighted_assignments():
    X = jnp.asarray([[1.0, 10.0]])
    C = jnp.asarray([[1.0, 0.0], [0.0, 10.0]])
    # unweighted: closer to c1 (distance 100 vs 1+... -> c1=100, c0=100?) use
    # weights emphasizing dim 0
    w = jnp.asarray([[100.0, 1.0]])
    a = get_assignments(X, C, w)
    assert int(a[0]) == 0  # heavy weight on dim0 -> match c0's dim0


def test_vq_quantizer_reduces_levels():
    W = RNG.standard_normal((16, 32)).astype(np.float32)
    q = VQQuantizer(vec_dim=2, bits=2, kmeans_iters=8)
    Wq = np.asarray(q.quantize(jnp.asarray(W)))
    assert Wq.shape == W.shape
    # vectors quantized to at most 2^(2*2)=16 distinct codewords
    vecs = np.unique(np.round(Wq.reshape(-1, 2), 6), axis=0)
    assert len(vecs) <= 16
    assert np.abs(Wq - W).mean() < np.abs(W).mean()


def test_analyze_outliers():
    W = RNG.standard_normal((64, 64)).astype(np.float32)
    W[3, 7] = 40.0
    W[3, 8] = -35.0  # adjacent outliers
    stats = analyze_outliers(W, std_dev=2.5, block_size=16)
    assert 0 < stats["outlier_fraction"] < 0.1
    assert stats["max_outliers_per_block"] >= 2
    assert stats["adjacent_outlier_rate"] > 0


def test_profile_model_outliers():
    params = {"a": {"kernel": jnp.asarray(RNG.standard_normal((32, 16)),
                                          jnp.float32)}}
    out = profile_model_outliers(params)
    assert "a/kernel" in out


def test_format_mse_monotone_in_bits():
    mse = format_mse_profile(["int8", "int4", "int2"])
    assert mse["int8"] < mse["int4"] < mse["int2"]


def test_checkpoint_roundtrip(tmp_path):
    from microscopiq_tpu.ops.packing import (dequantize_mx,
                                             dequantize_mx_outlier, pack_mx,
                                             pack_mx_outlier)
    W = jnp.asarray(RNG.standard_normal((64, 32)), jnp.float32)
    tree = {
        "model": {
            "dense": jnp.asarray(RNG.standard_normal((4, 4)), jnp.float32),
            "packed": pack_mx(W, 8, "fp6_e3m2", 32, axis=0),
            "packed_out": pack_mx_outlier(W, 8, 8, "int2", "fp4_e2m1",
                                          block_size=16, outlier_budget=4,
                                          axis=0),
        }
    }
    save_checkpoint(str(tmp_path / "ck"), tree)
    back = load_checkpoint(str(tmp_path / "ck"))
    np.testing.assert_array_equal(np.asarray(back["model"]["dense"]),
                                  np.asarray(tree["model"]["dense"]))
    np.testing.assert_array_equal(
        np.asarray(dequantize_mx(back["model"]["packed"])),
        np.asarray(dequantize_mx(tree["model"]["packed"])))
    np.testing.assert_array_equal(
        np.asarray(dequantize_mx_outlier(back["model"]["packed_out"])),
        np.asarray(dequantize_mx_outlier(tree["model"]["packed_out"])))


def test_delta_checkpoints():
    """make_delta/apply_delta roundtrip (vlm delta-weights parity)."""
    import jax.numpy as jnp

    from microscopiq_tpu.utils.checkpoint import (apply_delta, consolidate,
                                                  make_delta)

    base = {"a": {"kernel": jnp.ones((4, 4))}, "b": jnp.zeros(3)}
    target = {"a": {"kernel": jnp.full((4, 4), 3.0)}, "b": jnp.ones(3)}
    delta = make_delta(base, target)
    back = apply_delta(base, delta)
    np.testing.assert_allclose(np.asarray(back["a"]["kernel"]), 3.0)
    np.testing.assert_allclose(np.asarray(back["b"]), 1.0)
    # extra keys in delta are kept (mm_projector case)
    delta["extra"] = jnp.ones(2)
    merged = apply_delta(base, delta)
    assert "extra" in merged
    cons = consolidate(merged)
    assert isinstance(cons["b"], np.ndarray)


def test_checkpoint_preserves_transport(tmp_path):
    """Non-native transports (emi8/sb4/emi8m) must survive save/load —
    transport decides how codes bytes are decoded."""
    import jax.numpy as jnp

    from microscopiq_tpu.ops.packing import (dequantize_mx,
                                             merge_outlier_emi8,
                                             pack_mx, pack_mx_outlier)

    rng = np.random.default_rng(0)
    W = rng.standard_normal((64, 32)).astype(np.float32)
    W[rng.random(W.shape) < 0.05] *= 10.0
    emi8 = pack_mx(jnp.asarray(W), 8, "fp6_e3m2", 32, axis=0,
                   transport="emi8")
    emi8m = merge_outlier_emi8(pack_mx_outlier(
        jnp.asarray(W), 8, 8, "int2", "fp4", std_dev=2.0,
        block_size=16, outlier_budget=4, axis=0))
    tree = {"a": {"kernel": emi8}, "b": {"kernel": emi8m}}
    save_checkpoint(str(tmp_path / "ck2"), tree)
    back = load_checkpoint(str(tmp_path / "ck2"))
    for k in ("a", "b"):
        orig, got = tree[k]["kernel"], back[k]["kernel"]
        assert got.transport == orig.transport
        assert got.transport_mw == orig.transport_mw
        assert got.transport_fold == orig.transport_fold
        np.testing.assert_array_equal(np.asarray(dequantize_mx(got)),
                                      np.asarray(dequantize_mx(orig)))


def test_missing_dataset_fails_hard(tmp_path, monkeypatch):
    """A reportable eval must not silently print synthetic perplexity
    when the real corpus is missing; explicit opt-in is required."""
    import pytest as _pytest

    from microscopiq_tpu.eval import data as d

    monkeypatch.setattr(d, "DATA_DIR", str(tmp_path))
    monkeypatch.delenv("MICROSCOPIQ_ALLOW_SYNTHETIC", raising=False)
    with _pytest.raises(FileNotFoundError):
        d._load_text("wikitext2")
    # explicit opt-ins work
    assert len(d._load_text("wikitext2", allow_synthetic=True)) > 1000
    monkeypatch.setenv("MICROSCOPIQ_ALLOW_SYNTHETIC", "1")
    assert len(d._load_text("wikitext2")) > 1000
    # 'synthetic' by name is always fine
    monkeypatch.delenv("MICROSCOPIQ_ALLOW_SYNTHETIC")
    assert len(d._load_text("synthetic")) > 1000
