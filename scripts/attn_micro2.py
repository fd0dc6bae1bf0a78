"""Cost of producing head-major q/k/v: transpose vs fused einsum."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, T, H, HD, D = 6, 781, 12, 64, 768


def timeit(fn, *args, iters=50, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    float(jax.tree.leaves(r)[0].ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(jax.tree.leaves(r)[0].ravel()[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / iters


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, T, D), jnp.bfloat16)
    W = jax.random.normal(rng, (D, H, HD), jnp.bfloat16)
    W2 = jax.random.normal(rng, (D, D), jnp.bfloat16)
    q4 = jax.random.normal(rng, (B, T, H, HD), jnp.bfloat16)
    qp = jax.random.normal(rng, (B, 896, H, HD), jnp.bfloat16)

    dt = timeit(jax.jit(lambda x, w: x @ w), x, W2)
    print(f"dense btd,dd: {dt*1e3:.3f} ms", flush=True)
    dt = timeit(jax.jit(lambda x, w: jnp.einsum('btd,dhk->hbtk', x, w)), x, W)
    print(f"einsum->hbtk: {dt*1e3:.3f} ms", flush=True)
    dt = timeit(jax.jit(lambda x, w: jnp.einsum('btd,dhk->bhtk', x, w)), x, W)
    print(f"einsum->bhtk: {dt*1e3:.3f} ms", flush=True)
    dt = timeit(jax.jit(lambda q: q.transpose(2, 0, 1, 3)), qp)
    print(f"transpose (B,Tp,H,hd)->(H,B,Tp,hd): {dt*1e3:.3f} ms", flush=True)
    dt = timeit(
        jax.jit(lambda q: jnp.pad(q, ((0, 0), (0, 115), (0, 0), (0, 0)))
                .transpose(2, 0, 1, 3)), q4)
    print(f"pad+transpose: {dt*1e3:.3f} ms", flush=True)
    h4 = jax.random.normal(rng, (H, B, T, HD), jnp.bfloat16)
    Wo = jax.random.normal(rng, (H, HD, D), jnp.bfloat16)
    dt = timeit(jax.jit(lambda o, w: jnp.einsum('hbtk,hkd->btd', o, w)), h4, Wo)
    print(f"out einsum hbtk,hkd->btd: {dt*1e3:.3f} ms", flush=True)
