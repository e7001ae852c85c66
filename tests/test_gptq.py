"""GPTQ engine tests: Hessian parity, end-to-end parity vs the reference
fixture, and functional properties (error feedback reduces proxy loss)."""

import numpy as np
import jax.numpy as jnp
import pytest

from microscopiq_tpu.quant import GPTQ, MXQuantizer, UniformQuantizer


def test_hessian_parity(golden_gptq):
    """H accumulation must match the reference's running update
    (llm/gptq.py:32-58) on the same batches."""
    X = golden_gptq["X"]  # (8, 16, 64)
    W = golden_gptq["W_orig"]  # (48, 64)
    g = GPTQ(jnp.asarray(W))
    for i in range(X.shape[0]):
        g.add_batch(jnp.asarray(X[i]))
    np.testing.assert_allclose(np.asarray(g.H), golden_gptq["H"],
                               rtol=1e-5, atol=1e-5)


def test_gptq_endtoend_close_to_reference(golden_gptq):
    """Full fasterquant vs the reference's output on the same W/H.

    Not bit-exact (Cholesky differs between LAPACK and XLA), but the
    quantized weights should agree closely: same grids, same prune rule.
    """
    W = golden_gptq["W_orig"]
    X = golden_gptq["X"]
    Qref = golden_gptq["Q"]
    g = GPTQ(jnp.asarray(W), mode="mx_prune")
    g.quantizer = MXQuantizer()
    g.quantizer.configure(8, 8, "int2", "fp4_e2m1", std_dev=2,
                          axes=[0], block_size=16)
    for i in range(X.shape[0]):
        g.add_batch(jnp.asarray(X[i]))
    Q, losses = g.fasterquant(blocksize=32, percdamp=0.01)
    Q = np.asarray(Q)
    # Majority of entries land on identical grid points; aggregate error
    # must match the reference's within a small margin.
    agree = np.mean(np.isclose(Q, Qref, rtol=1e-4, atol=1e-6))
    assert agree > 0.8, f"only {agree:.2%} of quantized weights agree"
    err_ours = float(np.sum((Q - W) ** 2))
    err_ref = float(np.sum((Qref - W) ** 2))
    assert err_ours <= err_ref * 1.1, (err_ours, err_ref)


def test_gptq_better_than_rtn():
    """GPTQ error feedback should beat round-to-nearest on the Hessian
    proxy loss tr((W-Q) H (W-Q)ᵀ)."""
    rng = np.random.default_rng(0)
    W = rng.standard_normal((32, 64)).astype(np.float32) * 0.1
    X = rng.standard_normal((64, 128, 64)).astype(np.float32)
    # correlated inputs make the Hessian non-trivial
    X = X @ (np.eye(64) + 0.5 * rng.standard_normal((64, 64))).astype(np.float32)

    g = GPTQ(jnp.asarray(W), mode="mx_v1")
    g.quantizer = MXQuantizer()
    g.quantizer.configure(8, 8, "int4", "fp8_e4m3", std_dev=2,
                          axes=[0], block_size=16)
    for i in range(4):
        g.add_batch(jnp.asarray(X[i * 16:(i + 1) * 16].reshape(-1, 64)))
    Q, _ = g.fasterquant(blocksize=32)

    H = np.asarray(g.H)
    rtn = np.asarray(g.quantizer.quantize(jnp.asarray(W.T)).T)  # axes=[0] on cols
    def proxy(Q_):
        E = np.asarray(Q_) - W
        return float(np.trace(E @ H @ E.T))
    assert proxy(Q) < proxy(rtn), (proxy(Q), proxy(rtn))


def test_gptq_uniform_mode():
    rng = np.random.default_rng(1)
    W = rng.standard_normal((16, 32)).astype(np.float32)
    g = GPTQ(jnp.asarray(W), mode="uniform")
    g.quantizer = UniformQuantizer()
    g.quantizer.configure(bits=4, perchannel=True, sym=False)
    for _ in range(2):
        g.add_batch(jnp.asarray(rng.standard_normal((8, 32)).astype(np.float32)))
    Q, losses = g.fasterquant(blocksize=16)
    assert Q.shape == W.shape
    assert float(jnp.mean(jnp.abs(Q - W))) < 0.2
    # grid property: per-row values quantized to <= 16 levels
    nuniq = len(np.unique(np.round(np.asarray(Q)[0], 6)))
    assert nuniq <= 16 + 1


def test_gptq_actorder():
    rng = np.random.default_rng(2)
    W = rng.standard_normal((16, 32)).astype(np.float32)
    g = GPTQ(jnp.asarray(W), mode="mx_v1")
    g.quantizer = MXQuantizer()
    g.quantizer.configure(8, 8, "int4", "fp8_e4m3", std_dev=2,
                          axes=[0], block_size=16)
    g.add_batch(jnp.asarray(rng.standard_normal((32, 32)).astype(np.float32)))
    Q, _ = g.fasterquant(blocksize=16, actorder=True)
    assert Q.shape == W.shape
    assert np.isfinite(np.asarray(Q)).all()


def test_gptq_dead_columns():
    rng = np.random.default_rng(3)
    W = rng.standard_normal((8, 16)).astype(np.float32)
    X = rng.standard_normal((32, 16)).astype(np.float32)
    X[:, 5] = 0.0  # dead input feature
    g = GPTQ(jnp.asarray(W), mode="mx_v1")
    g.quantizer = MXQuantizer()
    g.quantizer.configure(8, 8, "int4", "fp8_e4m3", std_dev=2,
                          axes=[0], block_size=8)
    g.add_batch(jnp.asarray(X))
    Q, _ = g.fasterquant(blocksize=8)
    assert np.isfinite(np.asarray(Q)).all()
    assert (np.asarray(Q)[:, 5] == 0).all()  # dead column zeroed


def test_fasterquant_collect_decisions_reconstructs_q():
    """Decisions threading: the (codes, mask, L1/L2 exponents) collected
    during the column loop must reproduce Q exactly — the contract the
    sub-4-bit packed serving transport relies on."""
    rng = np.random.default_rng(21)
    W = rng.standard_normal((64, 48)).astype(np.float32)
    W[rng.random(W.shape) < 0.05] *= 8.0
    X = rng.standard_normal((4, 16, 48)).astype(np.float32)

    g = GPTQ(jnp.asarray(W), mode="mx_prune")
    g.quantizer = MXQuantizer(8, 8, "int2", "fp4", std_dev=2.0,
                              axes=(0,), block_size=16)
    for i in range(X.shape[0]):
        g.add_batch(jnp.asarray(X[i]))
    Q, _ = g.fasterquant(blocksize=32, collect_decisions=True)
    d = g.decisions
    assert d is not None and d["block_size"] == 16

    bs = d["block_size"]
    rep = lambda se: np.repeat(np.asarray(se), bs, axis=0)[:W.shape[0]]
    recon = (np.asarray(d["inl_code"]) * 2.0 ** rep(d["se_in"])
             + np.asarray(d["out_code"])
             * 2.0 ** (rep(d["se_out"]) - rep(d["se_in"])))
    np.testing.assert_array_equal(recon.astype(np.float32), np.asarray(Q))
    # mask marks exactly the nonzero outlier codes
    assert np.array_equal(np.asarray(d["mask"]) != 0,
                          np.asarray(d["out_code"]) != 0) or (
        np.asarray(d["out_code"])[np.asarray(d["mask"]) == 0] == 0).all()
