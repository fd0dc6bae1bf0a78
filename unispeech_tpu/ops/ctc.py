"""CTC loss and greedy decoding.

Matches the semantics of the reference CTC criterion
(/root/reference/src/fairseq/criterions/ctc.py:113-160): log_softmax over the
vocab, blank index 0 (the dictionary places `<s>`/bos at 0 and uses it as
blank, ctc.py:69-73), sum reduction over the batch, zero_infinity=True.
Implemented on top of optax.ctc_loss (a log-semiring lax.scan — the XLA-native
replacement for cuDNN CTC).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax


def ctc_loss(
    logits: jax.Array,  # (B, T, V) raw (pre-log-softmax) fp32
    logit_lengths: jax.Array,  # (B,) valid frame counts
    labels: jax.Array,  # (B, S) int32, padded with any value
    label_lengths: jax.Array,  # (B,) valid label counts
    blank_id: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Sum-reduced CTC loss with zero_infinity semantics.

    Returns (loss_sum, ntokens). Infinite per-sequence losses (label longer
    than frames) are zeroed like torch's zero_infinity=True (ctc.py:138-147).
    """
    B, T, V = logits.shape
    S = labels.shape[1]
    logit_pad = (
        jnp.arange(T, dtype=jnp.int32)[None, :] >= logit_lengths[:, None]
    ).astype(jnp.float32)
    label_pad = (
        jnp.arange(S, dtype=jnp.int32)[None, :] >= label_lengths[:, None]
    ).astype(jnp.float32)
    # optax expects labels != blank in valid region; padded labels are ignored
    # via label_pad but keep them != blank to avoid degenerate paths
    safe_labels = jnp.where(label_pad > 0, 1, labels).astype(jnp.int32)
    per_seq = optax.ctc_loss(
        logits.astype(jnp.float32), logit_pad, safe_labels, label_pad,
        blank_id=blank_id,
    )
    finite = jnp.isfinite(per_seq)
    loss = jnp.sum(jnp.where(finite, per_seq, 0.0))
    ntokens = jnp.sum(label_lengths)
    return loss, ntokens


def greedy_decode(
    logits: jax.Array,  # (B, T, V)
    logit_lengths: jax.Array,  # (B,)
    blank_id: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Greedy CTC collapse: argmax -> dedup repeats -> drop blanks.

    Static-shape: returns (tokens (B, T) padded with -1, lengths (B,)).
    Matches the reference's viterbi/greedy eval path (ctc.py:161-;
    w2l_decoder.py:104-148 uses the same best-path rule).
    """
    B, T, V = logits.shape
    pred = jnp.argmax(logits, axis=-1)  # (B, T)
    valid = jnp.arange(T, dtype=jnp.int32)[None, :] < logit_lengths[:, None]
    prev = jnp.concatenate(
        [jnp.full((B, 1), -1, pred.dtype), pred[:, :-1]], axis=1
    )
    keep = (pred != blank_id) & (pred != prev) & valid

    # stable compaction: scatter kept tokens to their output positions;
    # dropped tokens get an out-of-bounds index (mode="drop" discards them)
    out_pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1  # (B, T)
    scatter_pos = jnp.where(keep, out_pos, T)
    tokens = jnp.full((B, T), -1, dtype=pred.dtype)
    tokens = jax.vmap(
        lambda tok, pos, val: tok.at[pos].set(val, mode="drop")
    )(tokens, scatter_pos, pred)
    lengths = jnp.sum(keep.astype(jnp.int32), axis=1)
    return tokens, lengths
