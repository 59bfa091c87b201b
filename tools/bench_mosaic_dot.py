"""Micro-benchmark: does Mosaic run bf16 matmuls faster than f32, and does
an in-kernel astype(bf16) of f32 ref data actually engage the bf16 MXU rate
or get folded into an f32 dot?

Shapes mimic the fused-layer kernel's biggest dots: (TNK, TN) x (TN, C) with
TN=160, TNK=1280, C=256, iterated inside one kernel program to amortize
launch overhead. Grid of G programs mimics the real launch pattern.
"""
from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TN, TNK, C = 160, 1280, 256
G = 20
REPS = 24          # dots per program


def make_kernel(mode):
    def kern(a_ref, b_ref, o_ref):
        a = a_ref[0]
        b = b_ref[0]
        if mode == "cast_inside":
            a = a.astype(jnp.bfloat16)
            b = b.astype(jnp.bfloat16)
        acc = jnp.zeros((TNK, C), jnp.float32)
        for _ in range(REPS):
            d = jax.lax.dot(a, b, preferred_element_type=jnp.float32)
            acc += d
            # nonlinear scalar feedback: forces every dot to execute
            # serially (linearity rewrites can't collapse the chain)
            a = a * (1.0 + 1e-7 * jnp.abs(d[0, 0])).astype(a.dtype)
        o_ref[0] = acc
    return kern


def run(mode):
    dt = jnp.bfloat16 if mode == "bf16_refs" else jnp.float32
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((G, TNK, TN)), dt)
    b = jnp.asarray(rng.standard_normal((G, TN, C)), dt)
    vm = lambda shape: pl.BlockSpec(shape, lambda g: (g, 0, 0),
                                    memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        make_kernel(mode), grid=(G,),
        in_specs=[vm((1, TNK, TN)), vm((1, TN, C))],
        out_specs=vm((1, TNK, C)),
        out_shape=jax.ShapeDtypeStruct((G, TNK, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )
    f = jax.jit(f)
    out = f(a, b)
    out.block_until_ready()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = f(a, b)
        out.block_until_ready()
        ts.append(time.perf_counter() - t0)
    dt_s = min(ts)
    flops = 2.0 * G * REPS * TNK * TN * C
    print(json.dumps({"mode": mode, "ms": round(1e3 * dt_s, 3),
                      "tflops": round(flops / dt_s / 1e12, 2)}), flush=True)


if __name__ == "__main__":
    for m in ("f32_refs", "cast_inside", "bf16_refs"):
        run(m)
