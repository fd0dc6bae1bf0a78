"""On-chip timing of the fused attention kernel at the bench shape.

Repetitions run INSIDE one jitted lax.scan so the ~0.4 ms/dispatch tunnel
overhead does not pollute the numbers. Two compiles total.
Run: python scripts/attn_kernel_bench.py [T] [rate]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from unispeech_tpu.ops.pallas.flash_attention import fused_attention

B, H, HD = 6, 12, 64
REP = 10


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 768
    qt = int(os.environ.get("QT", "128"))
    rate = float(sys.argv[2]) if len(sys.argv) > 2 else 0.1
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (B, T, H, HD), jnp.bfloat16)
    k = jax.random.normal(rng, (B, T, H, HD), jnp.bfloat16)
    v = jax.random.normal(rng, (B, T, H, HD), jnp.bfloat16)
    bias = jax.random.normal(rng, (H, T, T), jnp.float32)
    gate = jax.nn.sigmoid(jax.random.normal(rng, (B, H, T), jnp.float32)) * 2

    flops_fwd = 4 * B * H * T * T * HD

    @jax.jit
    def many_fwd(q):
        def body(c, _):
            o = fused_attention(c, k, v, bias, gate, dropout_rate=rate,
                                dropout_seed=jnp.int32(7), q_tile=qt)
            return c + jnp.asarray(0.0, c.dtype) * o, None
        c, _ = jax.lax.scan(body, q, None, length=REP)
        return c

    def loss(q):
        o = fused_attention(q, k, v, bias, gate, dropout_rate=rate,
                            dropout_seed=jnp.int32(7), q_tile=qt)
        return (o.astype(jnp.float32) ** 2).sum()

    gfn = jax.grad(loss)

    @jax.jit
    def many_grad(q):
        def body(c, _):
            dq = gfn(c)
            return c + jnp.asarray(0.0, c.dtype) * dq, None
        c, _ = jax.lax.scan(body, q, None, length=REP)
        return c

    for name, fn, mult in [("fwd", many_fwd, 1), ("fwd+bwd", many_grad, 3)]:
        t0 = time.perf_counter()
        r = fn(q)
        float(r.ravel()[0].astype(jnp.float32))
        print(f"  [compile+1st {time.perf_counter()-t0:.1f}s]", flush=True)
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(q)
        float(r.ravel()[0].astype(jnp.float32))
        dt = (time.perf_counter() - t0) / (iters * REP)
        print(f"flash {name}(T={T},drop={rate}): {dt*1e3:.3f} ms  "
              f"{mult*flops_fwd/dt/1e12:.1f} TF/s", flush=True)


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    main()
