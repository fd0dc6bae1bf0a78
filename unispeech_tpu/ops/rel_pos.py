"""T5-style bucketed relative position bias (WavLM variant).

Pure-function reimplementation of the bucketing + bias lookup used by WavLM's
attention (reference: /root/reference/WavLM/modules.py:417-455). The bias is
computed once per forward (layer 0 in the reference owns the embedding table;
here the encoder owns it) and shared by all layers; each layer then applies
its own query-conditioned GRU gate (see ops/attention.py).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def relative_position_bucket(
    relative_position: jax.Array,
    num_buckets: int,
    max_distance: int,
    bidirectional: bool = True,
) -> jax.Array:
    """Map signed relative positions to bucket ids.

    Matches reference `_relative_positions_bucket`
    (/root/reference/WavLM/modules.py:417-442) exactly on integer outputs:
    bidirectional split (half the buckets per sign), exact buckets up to
    ``num_buckets//4``, then log-spaced up to ``max_distance``.
    """
    ret = jnp.zeros_like(relative_position)
    n = relative_position
    if bidirectional:
        num_buckets = num_buckets // 2
        ret = ret + (n > 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = -jnp.minimum(n, 0)

    max_exact = num_buckets // 2
    is_small = n < max_exact

    # log-bucketed for large distances; guard log(0) with a floor of 1
    # (those lanes are overridden by the is_small branch).
    n_safe = jnp.maximum(n, 1).astype(jnp.float32)
    val_if_large = max_exact + (
        jnp.log(n_safe / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)  # trunc-toward-zero like torch .to(long) on positives
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)

    ret = ret + jnp.where(is_small, n, val_if_large)
    return ret


def compute_rel_pos_bias(
    bias_table: jax.Array,  # (num_buckets, num_heads)
    query_length: int,
    key_length: int,
    num_buckets: int,
    max_distance: int,
    dtype=None,
) -> jax.Array:
    """Return (num_heads, query_length, key_length) bias.

    Matches reference `compute_bias` (/root/reference/WavLM/modules.py:444-455)
    numerically, but exploits that bias[t, s] depends only on the diagonal
    d = s - t: gather the T+S-1 per-diagonal values from the table (tiny),
    then expand diagonals -> (T, S) with the pad/reshape skew trick. Unlike a
    (T, S)-indexed `take`, whose transpose is a 9.6M-element scatter-add on
    the bias-table gradient (serialized on TPU), every op here (broadcast,
    pad, reshape, slice) has a vectorized transpose; the only scatter left is
    over the T+S-1 diagonal rows.
    """
    T, S = query_length, key_length
    H = bias_table.shape[1]
    ndiag = T + S - 1
    rel_pos = jnp.arange(ndiag, dtype=jnp.int32)[None, :] - (T - 1)  # s - t
    buckets = relative_position_bucket(
        rel_pos, num_buckets=num_buckets, max_distance=max_distance
    )[0]
    rel = jnp.take(bias_table, buckets, axis=0)  # (ndiag, H)
    if dtype is not None:
        # cast on the TINY per-diagonal vector, not the (H, T, S) expansion:
        # the skew only MOVES values, so casting here is numerically
        # identical to casting the result — but the whole expansion AND its
        # AD transpose (3 big (H, T, T+S) intermediates per backward) then
        # run at storage width instead of fp32 (~1.5 ms/step at Base bench
        # shapes); only the (ndiag, H) gradient converts back to fp32 for
        # the table scatter.
        rel = rel.astype(dtype)
    # skew: row t of the result is rel[t-offset ...]; flat index identity
    #   t*(T+S-1) + s + (T-1) == t*(T+S) + (s - t + T - 1)
    # so a width-(T+S) padded broadcast reshaped at width (T+S-1) from offset
    # T-1 reads exactly bias[t, s] = rel[s - t + T - 1].
    x = jnp.broadcast_to(rel.T[:, None, :], (H, T, ndiag))
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 1)))  # (H, T, T+S)
    flat = x.reshape(H, T * (T + S))
    flat = flat[:, T - 1 : T - 1 + T * ndiag]
    return flat.reshape(H, T, ndiag)[:, :, :S]
