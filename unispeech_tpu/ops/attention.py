"""Multi-head self-attention with WavLM's gated relative position bias.

Pure functions operating on (B, T, ...) arrays; flax modules in
models/encoder.py own the parameters and call into here. This is the XLA
reference path; a Pallas flash-attention kernel with the bias folded in
(ops/pallas/flash_attention.py) implements the same contract for the hot path.

Reference semantics: /root/reference/WavLM/modules.py:303-763. We follow the
GPU fast path (modules.py:508-564) — the one all published checkpoints were
trained with — where the GRU gate is computed from the *pre-projection* query
activations reshaped into heads (modules.py:524-533), not from q_proj output.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def rel_pos_gate(
    x: jax.Array,  # (B, T, D) pre-projection attention input
    grep_w: jax.Array,  # (head_dim, 8)
    grep_b: jax.Array,  # (8,)
    grep_a: jax.Array,  # (1, H, 1, 1)
    num_heads: int,
) -> jax.Array:
    """Per-query GRU-style gate multiplier for the shared rel-pos bias.

    gate = gate_a * (gate_b * grep_a - 1) + 2, gates in (0,1) from a sigmoid
    of a per-head linear projection of the query activations
    (/root/reference/WavLM/modules.py:530-533). Returns (B, H, T) — the full
    gated bias is the outer product gate[...,None] * position_bias[None],
    which the Pallas fused kernel never materializes.
    """
    B, T, D = x.shape
    head_dim = D // num_heads
    q = x.reshape(B, T, num_heads, head_dim).transpose(0, 2, 1, 3)  # (B,H,T,hd)
    # fp32 island: sigmoid saturation is precision-sensitive
    proj = (
        q.astype(jnp.float32) @ grep_w.astype(jnp.float32)
        + grep_b.astype(jnp.float32)
    )  # (B,H,T,8)
    r = proj.reshape(B, num_heads, T, 2, 4).sum(-1)  # (B,H,T,2)
    gates = jax.nn.sigmoid(r)
    gate_a, gate_b = gates[..., 0], gates[..., 1]  # (B,H,T)
    ga = grep_a.astype(jnp.float32).reshape(1, num_heads, 1)
    return gate_a * (gate_b * ga - 1.0) + 2.0  # (B,H,T)


def gated_position_bias(
    x: jax.Array,  # (B, T, D) pre-projection attention input
    position_bias: jax.Array,  # (H, T, S)
    grep_w: jax.Array,  # (head_dim, 8)
    grep_b: jax.Array,  # (8,)
    grep_a: jax.Array,  # (1, H, 1, 1)
    num_heads: int,
) -> jax.Array:
    """Materialized (B, H, T, S) gated bias — XLA reference path."""
    gate = rel_pos_gate(x, grep_w, grep_b, grep_a, num_heads)
    return gate[..., None] * position_bias[None].astype(jnp.float32)


def multihead_attention(
    q: jax.Array,  # (B, T, H, hd) already projected, unscaled
    k: jax.Array,  # (B, S, H, hd)
    v: jax.Array,  # (B, S, H, hd)
    bias: Optional[jax.Array] = None,  # (B, H, T, S) or (H, T, S) additive
    key_padding_mask: Optional[jax.Array] = None,  # (B, S) True = pad
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
) -> jax.Array:
    """Scaled dot-product attention, softmax in fp32, output (B, T, H, hd).

    Matches the reference computation order: scale q, logits + bias, pad mask
    to -inf, fp32 softmax (/root/reference/WavLM/modules.py:596,704-746).
    """
    head_dim = q.shape[-1]
    scale = head_dim**-0.5
    logits = jnp.einsum(
        "bthd,bshd->bhts", q * scale, k, preferred_element_type=jnp.float32
    )
    if bias is not None:
        if bias.ndim == 3:
            bias = bias[None]
        logits = logits + bias.astype(jnp.float32)
    if key_padding_mask is not None:
        neg = jnp.finfo(jnp.float32).min
        logits = jnp.where(key_padding_mask[:, None, None, :], neg, logits)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    probs = probs.astype(v.dtype)
    out = jnp.einsum("bhts,bshd->bthd", probs, v)
    return out
