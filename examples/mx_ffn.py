#!/usr/bin/env python
"""MX residual-MLP demo: train a tiny FFN with MX fake-quant layers.

Parity target: ``examples/scratch_3.py`` + ``examples/run_mx_fp6.sh``
(canonical config ``--w_elem_format fp6_e3m2 --a_elem_format fp6_e3m2
--scale_bits 4 --block_size 32 --bfloat 16``). TPU-first: the whole train
step (MX forward + STE backward + SGD update) is one jitted function.

Run: python examples/mx_ffn.py [--steps 200]
"""

import argparse

import jax
import jax.numpy as jnp

from microscopiq_tpu import nn as mnn
from microscopiq_tpu.specs import add_mx_args, finalize_mx_specs, get_mx_specs


def main():
    parser = argparse.ArgumentParser()
    add_mx_args(parser)
    parser.add_argument("--steps", type=int, default=200)
    parser.add_argument("--dim", type=int, default=128)
    args = parser.parse_args()
    if args.w_elem_format is None:
        args.w_elem_format = "fp6_e3m2"
        args.a_elem_format = "fp6_e3m2"
        args.scale_bits = 4
        args.block_size = 32
        args.bfloat = 16
    import dataclasses
    # scale_bits=4 clamps the shared exponent to [-8, 7]; training
    # gradients (~2^-13) fall below that and flush to zero, so keep the
    # backward pass unquantized for the demo (the reference exposes the
    # same knob as quantize_backprop, specs.py:101).
    specs = dataclasses.replace(get_mx_specs(args),
                                quantize_backprop=False)
    specs = finalize_mx_specs(specs)

    D = args.dim
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    params = {"w1": jax.random.normal(k1, (D, 4 * D)) * (D ** -0.5),
              "w2": jax.random.normal(k2, (4 * D, D)) * ((4 * D) ** -0.5)}
    x = jax.random.normal(k3, (256, D))
    target = jnp.sin(x)  # fit an elementwise function

    def forward(p, x):
        h = mnn.linear(x, p["w1"].T, None, specs)
        h = mnn.gelu(h, specs)
        return x + mnn.linear(h, p["w2"].T, None, specs)

    def loss_fn(p, x, y):
        return jnp.mean((forward(p, x) - y) ** 2)

    @jax.jit
    def step(p, x, y):
        loss, g = jax.value_and_grad(loss_fn)(p, x, y)
        return jax.tree_util.tree_map(lambda w, gw: w - 0.1 * gw, p, g), loss

    for i in range(args.steps):
        params, loss = step(params, x, target)
        if i % 50 == 0 or i == args.steps - 1:
            print(f"step {i:4d}  mse {float(loss):.5f}")
    print(f"final mse (MX {specs['w_elem_format']}): {float(loss):.5f}")


if __name__ == "__main__":
    main()
