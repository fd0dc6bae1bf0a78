"""Re-measure with in-jit fori_loop chains to exclude dispatch latency."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from unispeech_tpu.ops.pallas.flash_attention import fused_attention

B, T, H, HD, D = 6, 781, 12, 64, 768
N = 50


def timeit_loop(body, init, iters=N, reps=2):
    """body: x -> x chained in one jit; returns sec per body call."""
    f = jax.jit(
        lambda x0: jax.lax.fori_loop(0, iters, lambda i, x: body(x), x0)
    )
    r = f(init)
    float(jax.tree.leaves(r)[0].ravel()[0].astype(jnp.float32))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f(init)
        float(jax.tree.leaves(r)[0].ravel()[0].astype(jnp.float32))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, T, D), jnp.bfloat16)
    W2 = jax.random.normal(rng, (D, D), jnp.bfloat16) * 0.03

    dt = timeit_loop(lambda h: h @ W2, x, iters=3000)
    fl = 2 * B * T * D * D
    print(f"dense chain: {dt*1e6:.0f} us {fl/dt/1e12:.0f} TF/s", flush=True)

    # empty-ish body to estimate per-iteration floor
    dt = timeit_loop(lambda h: h + 1.0, x, iters=3000)
    print(f"add chain: {dt*1e6:.0f} us", flush=True)

    # flash attention chained: out (B,T,H,hd) -> reshape to next q
    q0 = jax.random.normal(rng, (B, T, H, HD), jnp.bfloat16)
    k = jax.random.normal(rng, (B, T, H, HD), jnp.bfloat16)
    v = jax.random.normal(rng, (B, T, H, HD), jnp.bfloat16)
    bias = jax.random.normal(rng, (H, T, T), jnp.float32)
    gate = jnp.ones((B, H, T), jnp.float32)

    def attn_body(q):
        return fused_attention(q, k, v, bias, gate, dropout_rate=0.1,
                               dropout_seed=jnp.int32(7))

    dt = timeit_loop(attn_body, q0, iters=600)
    fl = 4 * B * H * T * T * HD
    print(f"flash fwd chain: {dt*1e6:.0f} us {fl/dt/1e12:.1f} TF/s", flush=True)

    def attn_nodrop(q):
        return fused_attention(q, k, v, bias, gate)

    dt = timeit_loop(attn_nodrop, q0, iters=600)
    print(f"flash fwd nodrop chain: {dt*1e6:.0f} us {fl/dt/1e12:.1f} TF/s",
          flush=True)

    # grad chain
    def attn_grad_body(q):
        g = jax.grad(
            lambda qq: (fused_attention(qq, k, v, bias, gate,
                                        dropout_rate=0.1,
                                        dropout_seed=jnp.int32(7))
                        .astype(jnp.float32) ** 2).sum()
        )(q)
        return g.astype(jnp.bfloat16)

    dt = timeit_loop(attn_grad_body, q0, iters=300)
    print(f"flash fwd+bwd chain: {dt*1e6:.0f} us {3*fl/dt/1e12:.1f} TF/s",
          flush=True)

    # conv frontend chained
    from unispeech_tpu.models.encoder import ConvFeatureExtractor
    from unispeech_tpu.configs import base_encoder_config
    cfg = base_encoder_config()
    m = ConvFeatureExtractor(cfg, dtype=jnp.bfloat16)
    NS = 250_000
    wav = jax.random.normal(rng, (B, NS), jnp.float32)
    vs = m.init(rng, wav[:1, :50000])

    def conv_body(w):
        o = m.apply(vs, w)
        return w + 0.0 * jnp.sum(o.astype(jnp.float32)).astype(w.dtype)

    dt = timeit_loop(conv_body, wav, iters=100)
    t = NS
    fl = 0
    cin = 1
    for (cout, kk, s) in cfg.conv_layers:
        t = (t - kk) // s + 1
        fl += 2 * t * kk * cin * cout
        cin = cout
    fl *= B
    print(f"conv fwd chain: {dt*1e6:.0f} us {fl/dt/1e12:.1f} TF/s", flush=True)
