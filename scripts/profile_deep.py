"""Fine-grained stage timings: conv layers, norm/GELU islands, attention
chain (Pallas vs XLA), FFN chain. Run on the TPU."""

import functools
import time

import jax
import jax.numpy as jnp

from unispeech_tpu.configs import base_encoder_config
from unispeech_tpu.models.encoder import (
    Conv1dMM,
    Fp32GroupNorm,
    Fp32LayerNorm,
    gelu_fp32,
    strided_conv1d_as_matmul,
)
from unispeech_tpu.ops.attention import multihead_attention, rel_pos_gate
from unispeech_tpu.ops.pallas.flash_attention import fused_attention
from unispeech_tpu.ops.rel_pos import compute_rel_pos_bias


def timeit(fn, *args, iters=20, warmup=2):
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


def main():
    rng = jax.random.PRNGKey(0)
    B = 6
    enc = base_encoder_config()

    # --- conv stack, layer by layer (bf16) ---
    print("== conv layers (fwd) ==", flush=True)
    T = 250_000
    h = jax.random.normal(rng, (B, T, 1), jnp.bfloat16)
    for i, (dim, k, s) in enumerate(enc.conv_layers):
        cin = h.shape[-1]
        w = jax.random.normal(rng, (k, cin, dim), jnp.bfloat16) * 0.02
        f = jax.jit(functools.partial(strided_conv1d_as_matmul, stride=s))
        t = timeit(f, h, w)
        t_out = (h.shape[1] - k) // s + 1
        gf = 2 * B * t_out * k * cin * dim / 1e9
        print(f"conv{i} k={k} s={s} cin={cin}: {t:7.2f} ms  ({gf:.0f} GF, "
              f"{gf/t:.1f} TF/s)", flush=True)
        h = f(h, w)

    # --- islands on the conv0 output shape ---
    x0 = jax.random.normal(rng, (B, 50_000, 512), jnp.bfloat16)
    print("gelu_fp32 @ (6,50k,512):   %7.2f ms" % timeit(jax.jit(gelu_fp32), x0), flush=True)
    gn = Fp32GroupNorm(num_groups=512)
    gv = gn.init(rng, x0)
    print("groupnorm @ (6,50k,512):   %7.2f ms" % timeit(jax.jit(gn.apply), gv, x0), flush=True)
    gelu_bf16 = jax.jit(lambda x: jax.nn.gelu(x, approximate=False))
    print("gelu_bf16 @ (6,50k,512):   %7.2f ms" % timeit(gelu_bf16, x0), flush=True)

    # --- attention chain: 12 sequential calls (mimics per-layer cost) ---
    T, H, hd = 781, 12, 64
    D = H * hd
    q = jax.random.normal(rng, (B, T, H, hd), jnp.bfloat16)
    bias = jax.random.normal(rng, (H, T, T), jnp.float32)
    gate = jax.nn.sigmoid(jax.random.normal(rng, (B, H, T))) + 1.0

    def chain_fused(q):
        x = q
        for i in range(12):
            x = fused_attention(x, x, x, bias, gate, None,
                                dropout_rate=0.1, dropout_seed=jnp.int32(i))
        return x

    def chain_xla(q):
        x = q
        for i in range(12):
            full = gate[..., None] * bias[None]
            x = multihead_attention(
                x, x, x, bias=full, dropout_rng=jax.random.PRNGKey(i),
                dropout_rate=0.1, deterministic=False)
        return x

    print("attn chain x12 fused:      %7.2f ms" % timeit(jax.jit(chain_fused), q), flush=True)
    print("attn chain x12 xla:        %7.2f ms" % timeit(jax.jit(chain_xla), q), flush=True)

    # fused without dropout
    def chain_fused_nodrop(q):
        x = q
        for i in range(12):
            x = fused_attention(x, x, x, bias, gate, None)
        return x
    print("attn chain x12 fused nodrop:%6.2f ms" % timeit(jax.jit(chain_fused_nodrop), q), flush=True)

    # --- FFN chain x12 (bf16 matmuls + fp32 gelu) ---
    x = jax.random.normal(rng, (B, T, D), jnp.bfloat16)
    w1 = jax.random.normal(rng, (12, D, 3072), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(rng, (12, 3072, D), jnp.bfloat16) * 0.02

    def ffn_chain(x):
        for i in range(12):
            x = x + gelu_fp32(x @ w1[i]) @ w2[i]
        return x
    print("ffn chain x12:             %7.2f ms" % timeit(jax.jit(ffn_chain), x), flush=True)

    # rel-pos bias table expansion cost
    table = jax.random.normal(rng, (320, H), jnp.float32)
    f_bias = jax.jit(lambda t: compute_rel_pos_bias(t, T, T, 320, 1280))
    print("rel-pos bias expand:       %7.2f ms" % timeit(f_bias, table), flush=True)

    # fp32 layernorm on (B,T,D) x 25
    ln = Fp32LayerNorm()
    lv = ln.init(rng, x)
    def ln_chain(x):
        for _ in range(25):
            x = ln.apply(lv, x)
        return x
    print("fp32 LN x25 @ (6,781,768): %7.2f ms" % timeit(jax.jit(ln_chain), x), flush=True)


if __name__ == "__main__":
    main()
