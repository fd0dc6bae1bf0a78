"""Decoder-only Transformer language model (for shallow-fusion decoding).

Reference capability: fairseq's TransformerLanguageModel
(/root/reference/src/fairseq/models/transformer_lm.py:38-544) kept in the
fork solely so `W2lFairseqLMDecoder` can fuse a neural LM into beam-search
ASR decoding (/root/reference/src/examples/speech_recognition/
w2l_decoder.py:417-560), producing the published "+Transformer LM" WER rows
(/root/reference/ILS-SSL/README.md:63).

TPU reformulation: a plain flax decoder-only transformer — causal additive
mask, one static-shape forward for both training and scoring (no
incremental-state dicts; fusion scoring batches whole prefixes). Adaptive
input/softmax variants of the reference are intentionally collapsed to a
tied-embedding softmax: they are memory optimizations for 2019-era GPUs,
not behavior.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from unispeech_tpu.models.encoder import Fp32LayerNorm, gelu_fp32
from unispeech_tpu.models.seq2seq import sinusoidal_positions

Dtype = Any
NEG_INF = -1e30


@dataclass(frozen=True)
class TransformerLMConfig:
    vocab_size: int = 0
    embed_dim: int = 512
    ffn_dim: int = 2048
    layers: int = 6
    heads: int = 8
    dropout: float = 0.1
    padding_idx: int = 1
    max_positions: int = 2048
    learned_pos: bool = False
    normalize_before: bool = True  # pre-LN (transformer_lm.py:474-475)
    share_input_output_embed: bool = True  # --share-decoder-input-output-embed


class LMLayer(nn.Module):
    cfg: TransformerLMConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask, deterministic=True):
        c = self.cfg
        H = c.heads
        hd = c.embed_dim // H
        dense = lambda name, feats=c.embed_dim: nn.Dense(
            feats, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(0.02), name=name,
        )
        drop = lambda h: (
            h if deterministic or c.dropout == 0.0
            else nn.Dropout(rate=c.dropout, deterministic=False)(h)
        )
        ln1 = Fp32LayerNorm(name="self_attn_layer_norm")
        ln2 = Fp32LayerNorm(name="final_layer_norm")

        def attn(h):
            B, S, _ = h.shape
            q = dense("q_proj")(h).reshape(B, S, H, hd)
            k = dense("k_proj")(h).reshape(B, S, H, hd)
            v = dense("v_proj")(h).reshape(B, S, H, hd)
            logits = jnp.einsum(
                "bthd,bshd->bhts", q * (hd**-0.5), k,
                preferred_element_type=jnp.float32,
            ) + causal_mask
            p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            o = jnp.einsum("bhts,bshd->bthd", p, v).reshape(B, S, -1)
            return dense("out_proj")(o)

        def ffn(h):
            h = gelu_fp32(dense("fc1", c.ffn_dim)(h))
            return dense("fc2")(h)

        if c.normalize_before:
            x = x + drop(attn(ln1(x)))
            x = x + drop(ffn(ln2(x)))
        else:
            x = ln1(x + drop(attn(x)))
            x = ln2(x + drop(ffn(x)))
        return x


class TransformerLM(nn.Module):
    cfg: TransformerLMConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        tokens: jax.Array,  # (B, S) int32, left-to-right, pad = padding_idx
        deterministic: bool = True,
    ) -> jax.Array:  # (B, S, V) fp32 logits for the NEXT token
        c = self.cfg
        B, S = tokens.shape
        embed = nn.Embed(
            c.vocab_size, c.embed_dim,
            embedding_init=nn.initializers.normal(c.embed_dim**-0.5),
            param_dtype=jnp.float32, dtype=self.dtype, name="embed_tokens",
        )
        x = embed(tokens) * math.sqrt(c.embed_dim)
        # fairseq make_positions: cumsum over non-pad + padding_idx
        mask = (tokens != c.padding_idx).astype(jnp.int32)
        pos = jnp.cumsum(mask, axis=1) * mask + c.padding_idx
        if c.learned_pos:
            x = x + nn.Embed(
                c.max_positions + c.padding_idx + 1, c.embed_dim,
                embedding_init=nn.initializers.normal(0.02),
                param_dtype=jnp.float32, dtype=self.dtype,
                name="embed_positions",
            )(pos)
        else:
            x = x + sinusoidal_positions(
                c.max_positions, c.embed_dim, c.padding_idx
            )[pos].astype(self.dtype)
        if not deterministic and c.dropout > 0.0:
            x = nn.Dropout(rate=c.dropout, deterministic=False)(x)

        causal = jnp.triu(jnp.full((S, S), NEG_INF, jnp.float32), 1)[None, None]
        for i in range(c.layers):
            x = LMLayer(c, dtype=self.dtype, name=f"layer_{i}")(
                x, causal, deterministic
            )
        if c.normalize_before:
            x = Fp32LayerNorm(name="layer_norm")(x)

        w = embed.embedding if c.share_input_output_embed else self.param(
            "embed_out",
            nn.initializers.normal(c.embed_dim**-0.5),
            (c.vocab_size, c.embed_dim), jnp.float32,
        )
        return jnp.einsum(
            "btd,vd->btv", x.astype(jnp.float32), w.astype(jnp.float32)
        )


def lm_loss(
    logits: jax.Array,  # (B, S, V) next-token logits at each position
    targets: jax.Array,  # (B, S) = tokens shifted left (next tokens)
    padding_idx: int,
) -> tuple[jax.Array, jax.Array]:
    """Summed CE over non-pad targets + valid count (reference
    cross_entropy criterion semantics, sum reduction)."""
    lp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(lp, targets[..., None], axis=-1)[..., 0]
    valid = (targets != padding_idx).astype(jnp.float32)
    return (ce * valid).sum(), valid.sum()
