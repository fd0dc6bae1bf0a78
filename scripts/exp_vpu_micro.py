"""VPU micro-bench: cost of elementwise kernels at L1-frontend scale.

Measures ms per pass over a (6, 49152, 512) bf16 array (151M elements) for:
copy, exp, deg-8 poly gelu, deg-6 clamp-only gelu, A&S erf gelu (with exp),
and fused gelu+dgelu. Calibrates the op-cost model for the conv chain.

Run: python -u scripts/exp_vpu_micro.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from unispeech_tpu.ops.pallas.conv_stack import gelu_poly, dgelu_poly

B, T, C = 6, 49152, 512
TILE = 512


def _kern(fn, x_ref, y_ref):
    y_ref[...] = fn(x_ref[...]).astype(y_ref.dtype)


def run(fn, x):
    return pl.pallas_call(
        functools.partial(_kern, fn),
        grid=(B, T // TILE),
        in_specs=[pl.BlockSpec((1, TILE, C), lambda b, t: (b, t, 0))],
        out_specs=pl.BlockSpec((1, TILE, C), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, C), x.dtype),
    )(x)


def gelu_as(x):
    """A&S erf with exp (the round-3 kernel form)."""
    xf = x.astype(jnp.float32)
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    z = xf * 0.7071067811865476
    az = jnp.abs(z)
    t = 1.0 / (1.0 + p * az)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    e = 1.0 - poly * jnp.exp(-az * az)
    e = jnp.sign(z) * e
    return 0.5 * xf * (1.0 + e)


_EC6 = (0.7977546527455531, -0.13207268166258174, 0.01890029464874129,
        -0.0019069132507172663, 0.00012426883332851077,
        -4.593486471180218e-06, 7.213958366766196e-08)


def gelu_p6(x):
    xf = x.astype(jnp.float32)
    t = jnp.clip(xf, -4.0, 4.0)
    s = t * t
    q = jnp.float32(_EC6[-1])
    for c in _EC6[-2::-1]:
        q = q * s + jnp.float32(c)
    return 0.5 * xf * (1.0 + t * q)


def gelu_dgelu_p6(x):
    y = gelu_p6(x)
    d = dgelu_poly(x)
    return y + d  # just to consume both


def timeit(fn, x, iters=50):
    r = fn(x)
    float(r.ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(x)
    float(r.ravel()[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / iters


def main():
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, C), jnp.bfloat16)
    n = B * T * C
    for name, fn in [
        ("copy", lambda v: v),
        ("exp", lambda v: jnp.exp(v.astype(jnp.float32))),
        ("gelu_poly8", gelu_poly),
        ("gelu_poly6c", gelu_p6),
        ("gelu_AS_exp", gelu_as),
        ("dgelu_poly8", dgelu_poly),
        ("gelu+dgelu6", gelu_dgelu_p6),
    ]:
        f = jax.jit(lambda v, fn=fn: run(fn, v))
        dt = timeit(f, x)
        print(f"{name:12s} {dt*1e3:7.3f} ms  ({n/dt/1e9:6.1f} Gelem/s)",
              flush=True)


if __name__ == "__main__":
    main()
