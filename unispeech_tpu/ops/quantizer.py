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
            # (G, V, var_dim) codewords for codebook-negative sampling
            # (reference sample_from_codebook, gumbel_vector_quantizer.py:117)
            "codebook": cw,
        }
        if produce_targets:
            result["targets"] = k.reshape(B, T, G)
        return result


class KmeansVectorQuantizer(nn.Module):
    """Hard VQ with straight-through gradients (vq-wav2vec style).

    Reference behavior: /root/reference/src/fairseq/modules/
    kmeans_vector_quantizer.py:11-127 — grouped 1x1-conv projection +
    Fp32GroupNorm, nearest-codeword per group by L2 distance,
    straight-through pass, code perplexity, and the k-means loss
    (latent + gamma * commitment MSE).

    TPU reformulation: (B, T, C) layout throughout; the distance argmin is
    computed from the expanded ||ze - e||^2 = ||ze||^2 - 2 ze.e + ||e||^2
    form so the dominant term is one MXU matmul instead of a broadcast
    (num_vars, B, T, G, var_dim) difference tensor.
    """

    dim: int  # input channels
    num_vars: int
    groups: int
    combine_groups: bool
    vq_dim: int
    gamma: float = 0.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, produce_targets: bool = False):
        assert self.vq_dim % self.groups == 0
        var_dim = self.vq_dim // self.groups
        num_groups = 1 if self.combine_groups else self.groups
        B, T, C = x.shape
        G = self.groups

        embedding = self.param(
            "embedding",
            lambda rng: 0.01
            * jax.random.normal(rng, (self.num_vars, num_groups, var_dim)),
        )
        # grouped 1x1 conv == per-group (C/G, C/G) matmul, no bias
        proj_w = self.param(
            "proj_kernel",
            nn.initializers.lecun_normal(),
            (G, C // G, C // G),
            jnp.float32,
        )
        xg = x.reshape(B, T, G, C // G)
        ze = jnp.einsum(
            "btgi,gio->btgo", xg.astype(self.dtype), proj_w.astype(self.dtype)
        ).reshape(B, T, C)
        # Fp32GroupNorm(groups, dim) over (B, C, T): per-(group) stats across
        # (channels-in-group, time)
        zf = ze.astype(jnp.float32).reshape(B, T, G, C // G)
        mean = zf.mean(axis=(1, 3), keepdims=True)
        var = zf.var(axis=(1, 3), keepdims=True)
        gn_scale = self.param("gn_scale", nn.initializers.ones, (C,), jnp.float32)
        gn_bias = self.param("gn_bias", nn.initializers.zeros, (C,), jnp.float32)
        zf = ((zf - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(B, T, C)
        ze = zf * gn_scale + gn_bias  # (B, T, C) fp32

        emb = (
            jnp.broadcast_to(embedding, (self.num_vars, G, var_dim))
            if self.combine_groups
            else embedding
        ).astype(jnp.float32)

        zeg = ze.reshape(B, T, G, var_dim)
        # squared L2 distances via the matmul expansion (argmin-equivalent)
        dots = jnp.einsum("btgd,vgd->btgv", zeg, emb)
        e_sq = jnp.sum(emb**2, axis=-1).T  # (G, V)
        d2 = e_sq[None, None] - 2.0 * dots  # + ||ze||^2 (constant in v)
        idx = jnp.argmin(d2, axis=-1)  # (B, T, G)

        onehot = jax.nn.one_hot(idx, self.num_vars, dtype=jnp.float32)
        zq = jnp.einsum("btgv,vgd->btgd", onehot, emb).reshape(B, T, C)

        # straight-through: forward zq, gradient flows to ze
        out = jax.lax.stop_gradient(zq) + ze - jax.lax.stop_gradient(ze)

        hard_probs = onehot.mean(axis=(0, 1))  # (G, V)
        code_ppl = jnp.exp(
            -jnp.sum(hard_probs * jnp.log(hard_probs + 1e-7), axis=-1)
        ).sum()

        latent = jnp.mean((zq - jax.lax.stop_gradient(ze)) ** 2)
        commitment = jnp.mean((ze - jax.lax.stop_gradient(zq)) ** 2)
        result = {
            "x": out.astype(x.dtype),
            "num_vars": self.num_vars,
            "code_perplexity": code_ppl,
            "kmeans_loss": latent + self.gamma * commitment,
        }
        if produce_targets:
            result["targets"] = idx
        return result
