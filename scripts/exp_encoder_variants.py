"""Experiment: transformer-encoder lowering knobs on the TPU.

Times the 12-layer Base encoder fwd+bwd at the bench shape under
  * remat on/off (full nn.remat of the scanned layer body)
  * PRNG impl: threefry2x32 (default) vs rbg (TPU hardware RNG)
  * dropout on/off
  * flash attention on/off
Run: python scripts/exp_encoder_variants.py [tag ...]
"""

import sys
import time

import jax

# must happen before any key creation
if "rbg" in sys.argv:
    jax.config.update("jax_default_prng_impl", "rbg")

import dataclasses

import jax.numpy as jnp

from unispeech_tpu.configs import base_encoder_config
from unispeech_tpu.models.encoder import TransformerEncoder


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


def run(remat, dropout, flash, tag):
    enc = base_encoder_config(
        relative_position_embedding=True,
        gru_rel_pos=True,
        encoder_layerdrop=0.05 if dropout else 0.0,
        dropout=0.1 if dropout else 0.0,
        attention_dropout=0.1 if dropout else 0.0,
    )
    enc = dataclasses.replace(enc, remat_layers=remat, use_flash_attention=flash)
    B, T = 6, 781
    rng = jax.random.PRNGKey(0)
    frames = jax.random.normal(rng, (B, T, enc.encoder_embed_dim), jnp.bfloat16)
    tenc = TransformerEncoder(enc, dtype=jnp.bfloat16)
    tvars = tenc.init(rng, frames[:1])

    if dropout:
        def loss(v, x, r):
            out = tenc.apply(
                v, x, deterministic=False, rngs={"dropout": r, "layerdrop": r}
            ).x
            return jnp.sum(out.astype(jnp.float32))

        g = jax.jit(jax.grad(loss))
        t = timeit(g, tvars, frames, rng)
    else:
        g = jax.jit(jax.grad(
            lambda v, x: jnp.sum(
                tenc.apply(v, x, deterministic=True).x.astype(jnp.float32))))
        t = timeit(g, tvars, frames)
    print(f"{tag:44s} fwd+bwd {t:7.2f} ms", flush=True)


def main():
    args = set(sys.argv[1:]) - {"rbg"}
    impl = "rbg" if "rbg" in sys.argv else "threefry"
    todo = [
        ("remat1_drop1_flash1", True, True, True),
        ("remat0_drop1_flash1", False, True, True),
        ("remat1_drop0_flash1", True, False, True),
        ("remat0_drop0_flash1", False, False, True),
        ("remat0_drop1_flash0", False, True, False),
    ]
    for tag, remat, drop, flash in todo:
        if args and tag not in args:
            continue
        run(remat, drop, flash, f"{tag}_{impl}")


if __name__ == "__main__":
    main()
