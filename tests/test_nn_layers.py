"""nn-layer tests: forward quantization behavior, gradient flow through
the STE quantizers, and fp32-passthrough when specs are None — mirroring
the reference's per-layer tests (number_system/mx/tests/test_linear.py etc.)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import microscopiq_tpu.nn as mnn
from microscopiq_tpu.specs import finalize_mx_specs

RNG = np.random.default_rng(0)

SPECS = finalize_mx_specs({
    "w_elem_format": "fp6_e3m2", "a_elem_format": "fp6_e3m2",
    "scale_bits": 8, "block_size": 32, "bfloat": 16,
})


def _x(*shape):
    return jnp.asarray(RNG.standard_normal(shape).astype(np.float32))


def test_linear_none_specs_is_exact():
    x, w, b = _x(4, 32), _x(16, 32), _x(16)
    y = mnn.linear(x, w, b, None)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(x) @ np.asarray(w).T + np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_linear_quantized_close_and_different():
    x, w = _x(8, 64), _x(32, 64)
    y = mnn.linear(x, w, None, SPECS)
    y_exact = x @ w.T
    err = float(jnp.mean(jnp.abs(y - y_exact)) / jnp.mean(jnp.abs(y_exact)))
    assert 0 < err < 0.15, err  # quantized: not exact, but close


def test_linear_grad_flows():
    x, w, b = _x(8, 64), _x(32, 64), _x(32)

    def loss(w, b):
        return jnp.sum(mnn.linear(x, w, b, SPECS) ** 2)

    gw, gb = jax.grad(loss, argnums=(0, 1))(w, b)
    assert float(jnp.abs(gw).sum()) > 0
    assert float(jnp.abs(gb).sum()) > 0
    # compare against unquantized gradient direction
    gw0 = jax.grad(lambda w, b: jnp.sum(mnn.linear(x, w, b, None) ** 2),
                   argnums=0)(w, b)
    cos = jnp.sum(gw * gw0) / (jnp.linalg.norm(gw) * jnp.linalg.norm(gw0))
    assert float(cos) > 0.95


def test_linear_no_backprop_quant():
    specs = SPECS.replace(quantize_backprop=False)
    x, w = _x(4, 32), _x(16, 32)
    g = jax.grad(lambda w: jnp.sum(mnn.linear(x, w, None, specs)))(w)
    assert np.isfinite(np.asarray(g)).all()


def test_matmul_modes():
    a, b = _x(4, 64), _x(64, 16)
    for mode in ("aa", "aw", "wa"):
        y = mnn.matmul(a, b, SPECS, mode_config=mode)
        rel = float(jnp.mean(jnp.abs(y - a @ b)) / jnp.mean(jnp.abs(a @ b)))
        assert rel < 0.1, (mode, rel)


def test_bmm():
    a, b = _x(2, 4, 32), _x(2, 32, 8)
    y = mnn.bmm(a, b, SPECS)
    assert y.shape == (2, 4, 8)


def test_layernorm_and_rmsnorm():
    x = _x(4, 64)
    for cls in (mnn.LayerNorm, mnn.RMSNorm):
        m = cls(features=64, mx_specs=SPECS)
        params = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(params, x)
        m0 = cls(features=64, mx_specs=None)
        y0 = m0.apply(m0.init(jax.random.PRNGKey(0), x), x)
        rel = float(jnp.mean(jnp.abs(y - y0)) / (jnp.mean(jnp.abs(y0)) + 1e-9))
        assert rel < 0.05, (cls.__name__, rel)


def test_groupnorm():
    x = _x(2, 8, 16)
    m = mnn.GroupNorm(num_groups=4, features=8, mx_specs=SPECS)
    y = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert y.shape == x.shape


def test_batchnorm_train_eval():
    x = _x(16, 8)
    m = mnn.BatchNorm(features=8, mx_specs=SPECS, use_running_average=False)
    variables = m.init(jax.random.PRNGKey(0), x)
    y, updated = m.apply(variables, x, mutable=["batch_stats"])
    assert y.shape == x.shape
    assert float(jnp.abs(updated["batch_stats"]["mean"]).sum()) > 0


@pytest.mark.parametrize("name", ["relu", "relu6", "gelu", "silu",
                                  "sigmoid", "tanh"])
def test_activations(name):
    fn = getattr(mnn, name)
    ref = {"relu": lambda x: jnp.maximum(x, 0),
           "relu6": lambda x: jnp.clip(x, 0, 6),
           "gelu": jax.nn.gelu, "silu": jax.nn.silu,
           "sigmoid": jax.nn.sigmoid, "tanh": jnp.tanh}[name]
    x = _x(8, 32)
    y = fn(x, SPECS)
    y0 = ref(x)
    assert float(jnp.max(jnp.abs(y - y0))) < 0.1
    g = jax.grad(lambda x: jnp.sum(fn(x, SPECS)))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_softmax_and_exp2_variant():
    x = _x(4, 16)
    y = mnn.softmax(x, -1, SPECS)
    np.testing.assert_allclose(np.asarray(jnp.sum(y, -1)), 1.0, atol=0.05)
    y2 = mnn.softmax(x, -1, SPECS.replace(softmax_exp2=True))
    assert not np.allclose(np.asarray(y), np.asarray(y2))
    assert np.all(np.asarray(y2) >= 0)


def test_simd_ops():
    a, b = _x(4, 32), jnp.abs(_x(4, 32)) + 0.5
    assert float(jnp.max(jnp.abs(mnn.simd_add(a, b, SPECS) - (a + b)))) < 0.1
    assert float(jnp.max(jnp.abs(mnn.simd_div(a, b, SPECS) - a / b))) < 0.2
    assert float(jnp.max(jnp.abs(mnn.simd_sqrt(b, SPECS) - jnp.sqrt(b)))) < 0.05
    s = mnn.simd_reduce_sum(a, axis=-1, mx_specs=SPECS)
    assert s.shape == (4,)
    n = mnn.simd_norm(a, axis=-1, mx_specs=SPECS)
    assert float(jnp.min(n)) > 0


def test_conv2d():
    x = _x(2, 3, 16, 16)
    m = mnn.Conv2d(in_features=3, out_features=8, kernel_size=3, padding=1,
                   mx_specs=SPECS)
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (2, 8, 16, 16)
    m0 = mnn.Conv2d(in_features=3, out_features=8, kernel_size=3, padding=1,
                    mx_specs=None)
    y0 = m0.apply(params, x)
    rel = float(jnp.mean(jnp.abs(y - y0)) / jnp.mean(jnp.abs(y0)))
    assert rel < 0.1


def test_conv_transpose2d():
    x = _x(1, 4, 8, 8)
    w = _x(4, 6, 3, 3)  # (I, O, kh, kw)
    y = mnn.conv_transpose2d(x, w, stride=2, padding=1, mx_specs=SPECS)
    assert y.shape[1] == 6


def test_adaptive_avg_pool():
    x = _x(2, 4, 16, 16)
    y = mnn.adaptive_avg_pool2d(x, 4, SPECS)
    assert y.shape == (2, 4, 4, 4)


def test_lstm():
    xs = _x(5, 2, 16)  # (T, B, D)
    m = mnn.LSTM(hidden_size=8, mx_specs=SPECS)
    params = m.init(jax.random.PRNGKey(0), xs)
    ys, (h, c) = m.apply(params, xs)
    assert ys.shape == (5, 2, 8) and h.shape == (2, 8)


def test_quantize_params_and_pack_params():
    from microscopiq_tpu.nn import pack_params, quantize_params
    params = {"layers": {"0": {"attn": {"kernel": _x(64, 32)},
                               "bias": _x(32)},
                         "lm_head": {"kernel": _x(64, 100)}}}
    specs = SPECS.replace(w_elem_format="int4",
                          w_outlier_elem_format="fp8_e4m3")
    q = quantize_params(params, specs)
    assert not np.allclose(np.asarray(q["layers"]["0"]["attn"]["kernel"]),
                           np.asarray(params["layers"]["0"]["attn"]["kernel"]))
    # lm_head skipped
    np.testing.assert_array_equal(
        np.asarray(q["layers"]["lm_head"]["kernel"]),
        np.asarray(params["layers"]["lm_head"]["kernel"]))
    p = pack_params(params, specs)
    from microscopiq_tpu.ops.packing import PackedMX
    assert isinstance(p["layers"]["0"]["attn"]["kernel"], PackedMX)


def test_mx_op_table():
    table = mnn.mx_op_table(SPECS)
    assert set(table) >= {"linear", "matmul", "softmax", "gelu", "add"}
    y = table["add"](_x(4), _x(4))
    assert y.shape == (4,)


@pytest.mark.parametrize("qbp", [True, False])
def test_conv_backward_golden(golden_conv, qbp):
    """Conv2d forward AND the per-axis re-quantized backward must match
    the reference autograd.Function (convolution.py:120-326) on the same
    inputs — grads of sum(out) wrt input/weight/bias, with
    quantize_backprop on and off."""
    specs = finalize_mx_specs({
        "a_elem_format": "fp6_e3m2", "w_elem_format": "fp6_e3m2",
        "block_size": 4, "bfloat": 16, "quantize_backprop": qbp,
    })
    x = jnp.asarray(golden_conv["x"])
    w = jnp.asarray(golden_conv["w"])
    b = jnp.asarray(golden_conv["b"])
    key = f"conv|qbp{int(qbp)}"

    def f(x, w, b):
        return mnn.conv2d(x, w, b, stride=2, padding=1, groups=2,
                          mx_specs=specs).sum()

    out = mnn.conv2d(x, w, b, stride=2, padding=1, groups=2,
                     mx_specs=specs)
    np.testing.assert_allclose(np.asarray(out), golden_conv[key + "|out"],
                               rtol=1e-5, atol=1e-6)
    gx, gw, gb = jax.grad(f, argnums=(0, 1, 2))(x, w, b)
    np.testing.assert_allclose(np.asarray(gx), golden_conv[key + "|gx"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), golden_conv[key + "|gw"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), golden_conv[key + "|gb"],
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("qbp", [True, False])
def test_conv_transpose_backward_golden(golden_conv, qbp):
    """ConvTranspose2d forward/backward vs the reference
    (transpose_convolution.py:18-207)."""
    specs = finalize_mx_specs({
        "a_elem_format": "fp6_e3m2", "w_elem_format": "fp6_e3m2",
        "block_size": 4, "bfloat": 16, "quantize_backprop": qbp,
    })
    x = jnp.asarray(golden_conv["x"])
    wt = jnp.asarray(golden_conv["wt"])
    b = jnp.asarray(golden_conv["b"])
    key = f"convt|qbp{int(qbp)}"

    def f(x, w, b):
        return mnn.conv_transpose2d(x, w, b, stride=2, padding=1,
                                    mx_specs=specs).sum()

    out = mnn.conv_transpose2d(x, wt, b, stride=2, padding=1,
                               mx_specs=specs)
    np.testing.assert_allclose(np.asarray(out), golden_conv[key + "|out"],
                               rtol=1e-5, atol=1e-6)
    gx, gw, gb = jax.grad(f, argnums=(0, 1, 2))(x, wt, b)
    np.testing.assert_allclose(np.asarray(gx), golden_conv[key + "|gx"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), golden_conv[key + "|gw"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), golden_conv[key + "|gb"],
                               rtol=1e-4, atol=1e-5)
