"""Gumbel-softmax vector quantizer (wav2vec 2.0 / UniSpeech-SAT codebooks).

Reference behavior: /root/reference/src/fairseq/modules/
gumbel_vector_quantizer.py:11-202. TPU notes: the codebook combine is a
one-hot (B*T, G*V) x (G*V, var_dim)-style contraction that XLA maps onto the
MXU; everything is shape-static. Temperature is a function of num_updates
passed in by the train step (the reference mutates module state via
set_num_updates; we stay functional).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from unispeech_tpu.configs import GumbelVQConfig


def gumbel_softmax(
    rng: jax.Array, logits: jax.Array, tau: jax.Array, hard: bool = True
) -> jax.Array:
    """Straight-through Gumbel-softmax matching F.gumbel_softmax(hard=True)."""
    g = jax.random.gumbel(rng, logits.shape, dtype=jnp.float32)
    y_soft = jax.nn.softmax((logits.astype(jnp.float32) + g) / tau, axis=-1)
    if not hard:
        return y_soft
    idx = jnp.argmax(y_soft, axis=-1)
    y_hard = jax.nn.one_hot(idx, logits.shape[-1], dtype=y_soft.dtype)
    return y_hard + y_soft - jax.lax.stop_gradient(y_soft)


class GumbelVectorQuantizer(nn.Module):
    cfg: GumbelVQConfig
    input_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (B, T, input_dim)
        num_updates: jax.Array | int = 0,
        deterministic: bool = True,
        produce_targets: bool = False,
    ) -> dict:
        cfg = self.cfg
        G, V = cfg.groups, cfg.num_vars
        var_dim = cfg.vq_dim // G
        B, T, _ = x.shape

        codebook = self.param(
            "vars",
            nn.initializers.uniform(scale=1.0),
            (1, G * V, var_dim),
            jnp.float32,
        )

        h = x
        if cfg.weight_proj_depth > 1:
            inner = self.input_dim * cfg.weight_proj_factor
            for i in range(cfg.weight_proj_depth - 1):
                h = nn.Dense(inner, dtype=self.dtype, param_dtype=jnp.float32,
                             name=f"weight_proj_{i}")(h)
                h = nn.gelu(h, approximate=False)
            logits = nn.Dense(G * V, dtype=self.dtype, param_dtype=jnp.float32,
                              name="weight_proj_out")(h)
        else:
            # reference init: weight ~ N(0,1), bias 0 (gumbel_vector_quantizer.py:73-74)
            logits = nn.Dense(
                G * V,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=nn.initializers.normal(1.0),
                name="weight_proj",
            )(h)

        logits = logits.reshape(B * T * G, V).astype(jnp.float32)

        k = jnp.argmax(logits, axis=-1)
        hard_x = jax.nn.one_hot(k, V, dtype=jnp.float32).reshape(B * T, G, V)
        hard_probs = hard_x.mean(axis=0)  # (G, V)
        code_perplexity = jnp.exp(
            -jnp.sum(hard_probs * jnp.log(hard_probs + 1e-7), axis=-1)
        ).sum()
        avg_probs = jax.nn.softmax(logits.reshape(B * T, G, V), axis=-1).mean(axis=0)
        prob_perplexity = jnp.exp(
            -jnp.sum(avg_probs * jnp.log(avg_probs + 1e-7), axis=-1)
        ).sum()

        temp = cfg.temp_at(num_updates)
        if deterministic:
            onehot = hard_x.reshape(B * T * G, V)
        else:
            onehot = gumbel_softmax(self.make_rng("gumbel"), logits, temp, hard=True)

        # combine codewords: (B*T, G, V) x (G, V, var_dim) -> (B*T, G, var_dim)
        cw = codebook.reshape(G, V, var_dim).astype(jnp.float32)
        q = jnp.einsum("sgv,gvd->sgd", onehot.reshape(B * T, G, V), cw)
        q = q.reshape(B, T, G * var_dim).astype(x.dtype)

        result = {
            "x": q,
            "num_vars": V * G,
            "code_perplexity": code_perplexity,
            "prob_perplexity": prob_perplexity,
            "temp": temp,
        }
        if produce_targets:
            result["targets"] = k.reshape(B, T, G)
        return result
