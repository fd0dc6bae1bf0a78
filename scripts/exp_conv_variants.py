"""Experiment: conv-frontend formulations on the TPU.

Times the full 7-layer WavLM conv stack (with fp32 GN/GELU islands) under
several lowering strategies, fwd and fwd+bwd, to pick the fastest.
"""

import functools
import time

import jax
import jax.numpy as jnp

B, T0 = 6, 250_000
CONV = [(512, 10, 5)] + [(512, 3, 2)] * 4 + [(512, 2, 2)] * 2


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def gelu_fp32(x):
    return jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)


def groupnorm(x):  # num_groups == C: per-channel over time
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=1, keepdims=True)
    var = xf.var(axis=1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)


def make_weights(key):
    ws = []
    cin = 1
    for dim, k, s in CONV:
        key, k2 = jax.random.split(key)
        ws.append(jax.random.normal(k2, (k, cin, dim), jnp.bfloat16) * 0.02)
        cin = dim
    return ws


# --- variant A: current slice_in_dim im2col ---
def conv_A(h, kernel, stride):
    k, cin, cout = kernel.shape
    T = h.shape[1]
    t_out = (T - k) // stride + 1
    if k == stride:
        win = h[:, : t_out * k, :].reshape(h.shape[0], t_out, k * cin)
    else:
        span = (t_out - 1) * stride + 1
        taps = [jax.lax.slice_in_dim(h, i, i + span, stride, axis=1) for i in range(k)]
        win = jnp.concatenate(taps, axis=-1)
    return jax.lax.dot_general(
        win, kernel.reshape(k * cin, cout).astype(win.dtype),
        (((2,), (0,)), ((), ())), preferred_element_type=win.dtype)


# --- variant B: phase-reshape im2col (contiguous slices only) ---
def conv_B(h, kernel, stride):
    k, cin, cout = kernel.shape
    Bb, T, _ = h.shape
    t_out = (T - k) // stride + 1
    if k == stride:
        win = h[:, : t_out * k, :].reshape(Bb, t_out, k * cin)
    else:
        # k = m*s + r: m full s-blocks + r leading channels of the next block.
        # Need m+t_out blocks when r>0 (may exceed T//s by one: the padded
        # tail entries are never part of a valid window, zeros are safe).
        m, r = divmod(k, stride)
        nb = (m + t_out) if r else (m - 1 + t_out)
        pad = nb * stride - T
        if pad > 0:
            h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        v = h[:, : nb * stride, :].reshape(Bb, nb, stride * cin)
        parts = [v[:, j : j + t_out] for j in range(m)]
        if r:
            parts.append(v[:, m : m + t_out, : r * cin])
        win = jnp.concatenate(parts, axis=-1)
    return jax.lax.dot_general(
        win, kernel.reshape(k * cin, cout).astype(win.dtype),
        (((2,), (0,)), ((), ())), preferred_element_type=win.dtype)


# --- variant C: sum of per-block matmuls, no concat ---
def conv_C(h, kernel, stride):
    k, cin, cout = kernel.shape
    Bb, T, _ = h.shape
    t_out = (T - k) // stride + 1
    if k == stride:
        win = h[:, : t_out * k, :].reshape(Bb, t_out, k * cin)
        return jax.lax.dot_general(
            win, kernel.reshape(k * cin, cout).astype(win.dtype),
            (((2,), (0,)), ((), ())), preferred_element_type=win.dtype)
    m, r = divmod(k, stride)
    nb = (m + t_out) if r else (m - 1 + t_out)
    pad = nb * stride - T
    if pad > 0:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
    v = h[:, : nb * stride, :].reshape(Bb, nb, stride * cin)
    kr = kernel.reshape(k * cin, cout).astype(h.dtype)
    y = None
    for j in range(m):
        wj = kr[j * stride * cin : (j + 1) * stride * cin]
        t = jax.lax.dot_general(v[:, j : j + t_out], wj,
                                (((2,), (0,)), ((), ())),
                                preferred_element_type=h.dtype)
        y = t if y is None else y + t
    if r:
        wj = kr[m * stride * cin :]
        t = jax.lax.dot_general(v[:, m : m + t_out, : r * cin], wj,
                                (((2,), (0,)), ((), ())),
                                preferred_element_type=h.dtype)
        y = y + t
    return y


# --- variant D: lax.conv ---
def conv_D(h, kernel, stride):
    return jax.lax.conv_general_dilated(
        h, kernel.astype(h.dtype), (stride,), "VALID",
        dimension_numbers=("NHC", "HIO", "NHC"))


def stack(conv_fn, wav, ws):
    h = wav[:, :, None].astype(jnp.bfloat16)
    for i, ((dim, k, s), w) in enumerate(zip(CONV, ws)):
        h = conv_fn(h, w, s)
        if i == 0:
            h = groupnorm(h)
        h = gelu_fp32(h)
    return h


def stack_bf16gelu(conv_fn, wav, ws):
    h = wav[:, :, None].astype(jnp.bfloat16)
    for i, ((dim, k, s), w) in enumerate(zip(CONV, ws)):
        h = conv_fn(h, w, s)
        if i == 0:
            h = groupnorm(h)
        h = jax.nn.gelu(h, approximate=False)
    return h


VARIANTS = {
    "A": ("slice-im2col", conv_A, stack),
    "B": ("phase-im2col", conv_B, stack),
    "C": ("block-matmuls", conv_C, stack),
    "D": ("lax.conv", conv_D, stack),
    "Bg": ("B bf16-gelu", conv_B, stack_bf16gelu),
    "Cg": ("C bf16-gelu", conv_C, stack_bf16gelu),
}


def main(which):
    rng = jax.random.PRNGKey(0)
    ws = make_weights(rng)

    if which == "check":
        # correctness vs lax.conv on an odd-length input
        small = jax.random.normal(rng, (2, 4001), jnp.float32)
        ref = jax.jit(functools.partial(stack, conv_D))(small, ws)
        for name, fn in [("A", conv_A), ("B", conv_B), ("C", conv_C)]:
            out = jax.jit(functools.partial(stack, fn))(small, ws)
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
            print(f"correctness {name}: shape {out.shape} vs {ref.shape}, "
                  f"maxerr {err:.3e}", flush=True)
        return

    wav = jax.random.normal(rng, (B, T0), jnp.float32)
    name, fn, stk = VARIANTS[which]
    f = jax.jit(functools.partial(stk, fn))
    t_fwd = timeit(f, wav, ws)
    print(f"{name:16s} fwd {t_fwd:7.2f} ms", flush=True)
    g = jax.jit(jax.grad(
        lambda wv, wss: jnp.sum(stk(fn, wv, wss).astype(jnp.float32)) * 1e-6,
        argnums=1))
    t_bwd = timeit(g, wav, ws)
    print(f"{name:16s} fwd+bwd {t_bwd:7.2f} ms", flush=True)


if __name__ == "__main__":
    import sys

    main(sys.argv[1] if len(sys.argv) > 1 else "check")
