"""On-chip check + micro-bench of the fused conv blocks (conv_stack.py).

Validates on real TPU (bf16):
  1. Element-window padding reads as zeros (values match XLA within bf16
     noise at the last partial tile).
  2. fwd and fwd+bwd speed vs the XLA stride-collapsed matmul path at the
     L1 (biggest) frontend shape, and the whole L1..L6 chain.

Run: python -u scripts/exp_conv_stack_tpu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from unispeech_tpu.models.encoder import strided_conv1d_as_matmul
from unispeech_tpu.ops.pallas.conv_stack import conv_gelu_block

B, C = 6, 512
T1 = 49167


def gelu_exact(x):
    return jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)


def timeit(fn, *args, iters=30):
    r = fn(*args)
    float(jax.tree.leaves(r)[0].ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(jax.tree.leaves(r)[0].ravel()[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / iters


def main():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, T1, C), jnp.bfloat16)
    w3 = jax.random.normal(jax.random.PRNGKey(1), (3, C, C), jnp.bfloat16) * 0.05
    w2 = jax.random.normal(jax.random.PRNGKey(2), (2, C, C), jnp.bfloat16) * 0.05

    # --- single L1 block, fwd ---
    blk = jax.jit(lambda x, w: conv_gelu_block(x, w, valid_len=T1,
                                               gelu_in=True)[0])
    ref = jax.jit(lambda x, w: gelu_exact(
        strided_conv1d_as_matmul(gelu_exact(x), w, 2)))
    y_k = blk(x, w3)
    y_r = ref(x, w3)
    t1 = y_r.shape[1]
    err = float(jnp.max(jnp.abs(y_k[:, :t1].astype(jnp.float32)
                                - y_r.astype(jnp.float32))))
    print(f"L1 fwd maxerr {err:.4f}", flush=True)
    flops = 2 * B * t1 * 3 * C * C
    dt_k = timeit(blk, x, w3)
    dt_r = timeit(ref, x, w3)
    print(f"L1 fwd: kernel {dt_k*1e3:.3f} ms ({flops/dt_k/1e12:.1f} TF/s)  "
          f"xla {dt_r*1e3:.3f} ms ({flops/dt_r/1e12:.1f} TF/s)", flush=True)

    # --- single L1 block, fwd+bwd ---
    def loss_k(x, w):
        y, t = conv_gelu_block(x, w, valid_len=T1, gelu_in=True)
        return (y[:, :t].astype(jnp.float32) ** 2).sum()

    def loss_r(x, w):
        return (ref(x, w).astype(jnp.float32) ** 2).sum()

    g_k = jax.jit(jax.grad(loss_k, argnums=(0, 1)))
    g_r = jax.jit(jax.grad(loss_r, argnums=(0, 1)))
    gx_k, gw_k = g_k(x, w3)
    gx_r, gw_r = g_r(x, w3)
    gerr = float(jnp.max(jnp.abs(gx_k.astype(jnp.float32)
                                 - gx_r.astype(jnp.float32))))
    gwerr = float(jnp.max(jnp.abs(gw_k.astype(jnp.float32)
                                  - gw_r.astype(jnp.float32))))
    gwmag = float(jnp.max(jnp.abs(gw_r.astype(jnp.float32))))
    print(f"L1 bwd maxerr dx {gerr:.4f} dw {gwerr:.3f} (|dw|max {gwmag:.1f})",
          flush=True)
    dt_k = timeit(g_k, x, w3)
    dt_r = timeit(g_r, x, w3)
    print(f"L1 f+b: kernel {dt_k*1e3:.3f} ms ({3*flops/dt_k/1e12:.1f} TF/s)  "
          f"xla {dt_r*1e3:.3f} ms ({3*flops/dt_r/1e12:.1f} TF/s)", flush=True)

    # --- full L1..L6 chain fwd+bwd ---
    ws3 = [w3 * (1 + 0.01 * i) for i in range(4)]
    ws2 = [w2, w2 * 1.01]

    def chain_k(x, ws3, ws2):
        h, t = x, T1
        for i, w in enumerate(ws3):
            h, t = conv_gelu_block(h, w, valid_len=t, gelu_in=(i == 0))
        for w in ws2:
            h, t = conv_gelu_block(h, w, valid_len=t)
        return h[:, :t]

    def chain_r(x, ws3, ws2):
        h = gelu_exact(x)
        for w in ws3:
            h = gelu_exact(strided_conv1d_as_matmul(h, w, 2))
        for w in ws2:
            h = gelu_exact(strided_conv1d_as_matmul(h, w, 2))
        return h

    ck = jax.jit(chain_k)
    cr = jax.jit(chain_r)
    yk = ck(x, ws3, ws2)
    yr = cr(x, ws3, ws2)
    cerr = float(jnp.max(jnp.abs(yk.astype(jnp.float32)
                                 - yr.astype(jnp.float32))))
    print(f"chain fwd maxerr {cerr:.4f} shape {yk.shape} vs {yr.shape}",
          flush=True)

    gck = jax.jit(jax.grad(lambda *a: (chain_k(*a).astype(jnp.float32) ** 2
                                       ).sum(), argnums=(0, 1, 2)))
    gcr = jax.jit(jax.grad(lambda *a: (chain_r(*a).astype(jnp.float32) ** 2
                                       ).sum(), argnums=(0, 1, 2)))
    _ = gck(x, ws3, ws2), gcr(x, ws3, ws2)
    # chain FLOPs fwd
    cf, t, cin = 0, T1, C
    for k in (3, 3, 3, 3, 2, 2):
        t = (t - k) // 2 + 1
        cf += 2 * B * t * k * C * C
    dt_ck = timeit(ck, x, ws3, ws2)
    dt_cr = timeit(cr, x, ws3, ws2)
    print(f"chain fwd: kernel {dt_ck*1e3:.3f} ms ({cf/dt_ck/1e12:.1f} TF/s)  "
          f"xla {dt_cr*1e3:.3f} ms ({cf/dt_cr/1e12:.1f} TF/s)", flush=True)
    dt_gk = timeit(gck, x, ws3, ws2)
    dt_gr = timeit(gcr, x, ws3, ws2)
    print(f"chain f+b: kernel {dt_gk*1e3:.3f} ms ({3*cf/dt_gk/1e12:.1f} TF/s) "
          f" xla {dt_gr*1e3:.3f} ms ({3*cf/dt_gr/1e12:.1f} TF/s)", flush=True)


if __name__ == "__main__":
    main()
