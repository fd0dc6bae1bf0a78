"""Isolate flash-attention fwd kernel cost drivers on the real chip."""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unispeech_tpu.ops.pallas.flash_attention import (
    _keep_scale, _tile_seed,
)

B, T, H, HD = 6, 781, 12, 64
TP = 896
SP = 896


def timeit(fn, *args, iters=50, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    float(jax.tree.leaves(r)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(jax.tree.leaves(r)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def make_kernel(mode, rate, q_tile):
    def kern(seed_ref, q_ref, k_ref, v_ref, bias_ref, gate_ref, o_ref,
             lse_ref):
        h = pl.program_id(0)
        qi = pl.program_id(1)
        bias = bias_ref[0].astype(jnp.float32)
        for b in range(B):
            q = q_ref[0, b]
            k = k_ref[0, b]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * 0.125
            if mode != "nosoftmax":
                if mode != "nobias":
                    gate = gate_ref[0, b].astype(jnp.float32)
                    s = s + gate * bias
                m = jnp.max(s, axis=-1, keepdims=True)
                if mode == "exp2":
                    p = jax.lax.exp2((s - m) * 1.4426950408889634)
                else:
                    p = jnp.exp(s - m)
                l = jnp.sum(p, axis=-1, keepdims=True)
                if mode == "defer_div":
                    probs = p
                else:
                    probs = p / l
                if rate > 0.0:
                    pltpu.prng_seed(_tile_seed(seed_ref[0], b * H + h, qi))
                    probs = probs * _keep_scale(probs.shape, rate)
            else:
                probs = s
                l = jnp.ones((q_tile, 1), jnp.float32)
            o = jnp.dot(probs.astype(v_ref.dtype), v_ref[0, b],
                        preferred_element_type=jnp.float32)
            if mode == "defer_div":
                o = o / l
            o_ref[0, b] = o.astype(o_ref.dtype)
            lse_ref[0, b, :, 0] = l[:, 0]
    return kern


def run(mode, rate, q_tile=128):
    rng = jax.random.PRNGKey(0)
    qh = jax.random.normal(rng, (H, B, TP, HD), jnp.bfloat16)
    kh = jax.random.normal(rng, (H, B, SP, HD), jnp.bfloat16)
    vh = jax.random.normal(rng, (H, B, SP, HD), jnp.bfloat16)
    bias = jax.random.normal(rng, (H, TP, SP), jnp.bfloat16)
    gate = jnp.ones((H, B, TP, 1), jnp.float32)
    seed = jnp.zeros((1,), jnp.int32)

    def q_map(h, qi, *_):
        return (h, 0, qi, 0)

    def kv_map(h, qi, *_):
        return (h, 0, 0, 0)

    f = pl.pallas_call(
        make_kernel(mode, rate, q_tile),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(H, TP // q_tile),
            in_specs=[
                pl.BlockSpec((1, B, q_tile, HD), q_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, SP, HD), kv_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, SP, HD), kv_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, q_tile, SP), lambda h, qi, *_: (h, qi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, q_tile, 1), q_map, memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, B, q_tile, HD), q_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, q_tile, 1), q_map, memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((H, B, TP, HD), jnp.bfloat16),
            jax.ShapeDtypeStruct((H, B, TP, 1), jnp.float32),
        ],
        interpret=False,
    )
    jf = jax.jit(lambda *a: f(*a))
    dt = timeit(jf, seed, qh, kh, vh, bias, gate)
    flops = 4 * H * B * TP * SP * HD
    print(f"{mode} rate={rate} qt={q_tile}: {dt*1e3:.2f} ms "
          f"{flops/dt/1e12:.1f} TF/s", flush=True)


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    run("full", 0.1)
    run("full", 0.0)
    run("nobias", 0.0)
    run("nosoftmax", 0.0)
    run("exp2", 0.1)
    run("defer_div", 0.1)
    run("full", 0.1, q_tile=256)
    run("full", 0.1, q_tile=448)
