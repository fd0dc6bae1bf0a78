"""Shape-static span masking for masked-prediction pretraining.

The reference samples mask spans on the host with numpy and dynamic shapes
(/root/reference/WavLM/WavLM.py:35-159, src/fairseq/data/data_utils.py:393).
Its own TPU path already precomputes masks because of this
(src/fairseq/tasks/audio_pretraining.py:144-156). Here the sampler runs
*on device* inside the jitted step with fully static shapes:

  * K = floor(mask_prob * T / mask_length) span starts are always drawn,
    plus one extra start kept with the probabilistic-rounding remainder —
    matching the reference's `int(p*T/L + rand())` count in distribution.
  * starts ~ Uniform[0, sz - min_len] per row (sz = unpadded length), spans
    expand by mask_length; overlaps merge naturally via max-combine, like the
    reference's default (no_overlap=False) path.
  * the reference equalizes the masked count across rows by subsampling to
    the batch min (WavLM.py:153-157) purely to allow a dense gather; our loss
    consumes a weight mask instead, so equalization is unnecessary — every
    row keeps its sampled spans.

Sampling *with* replacement (reference: without) is the one distributional
departure; with T>=500 frames and K~=32 starts the collision rate is ~1% and
merely merges spans, which overlapping spans do anyway.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from unispeech_tpu.configs import MaskConfig


def sample_span_mask(
    rng: jax.Array,
    batch: int,
    seq_len: int,
    cfg: MaskConfig,
    lengths: jax.Array | None = None,  # (B,) valid lengths; None = all valid
) -> jax.Array:
    """Return a (B, T) bool mask; True = position is masked.

    Static output shape; everything vectorized over (B, K, T).
    """
    if cfg.mask_prob <= 0.0:
        return jnp.zeros((batch, seq_len), dtype=bool)

    base_k = int(cfg.mask_prob * seq_len / float(cfg.mask_length))
    k = max(base_k + 1, cfg.min_masks)  # +1 slot for probabilistic rounding
    frac = cfg.mask_prob * seq_len / float(cfg.mask_length) - base_k

    r_len, r_start, r_round = jax.random.split(rng, 3)

    # span lengths per (B, K)
    if cfg.mask_selection == "static":
        span_len = jnp.full((batch, k), cfg.mask_length, dtype=jnp.int32)
    elif cfg.mask_selection == "uniform":
        span_len = jax.random.randint(
            r_len, (batch, k), int(cfg.mask_other), cfg.mask_length * 2 + 1
        )
    elif cfg.mask_selection == "normal":
        s = jax.random.normal(r_len, (batch, k)) * cfg.mask_other + cfg.mask_length
        span_len = jnp.maximum(jnp.round(s), 1).astype(jnp.int32)
    elif cfg.mask_selection == "poisson":
        span_len = jax.random.poisson(r_len, cfg.mask_length, (batch, k)).astype(
            jnp.int32
        )
    else:
        raise ValueError(f"unknown mask_selection {cfg.mask_selection}")

    if lengths is None:
        sz = jnp.full((batch,), seq_len, dtype=jnp.int32)
    else:
        sz = lengths.astype(jnp.int32)

    # starts uniform in [0, sz - min_len]; reference draws from
    # choice(sz - min(lengths)) (WavLM.py:137-141)
    min_len = span_len.min(axis=1)  # (B,)
    hi = jnp.maximum(sz - min_len, 1)  # (B,)
    u = jax.random.uniform(r_start, (batch, k))
    start = (u * hi[:, None]).astype(jnp.int32)  # (B, K)

    # per-row number of active spans with probabilistic rounding; padded rows
    # scale K by sz/T like the reference recomputes num_mask per row
    n_eff = cfg.mask_prob * sz.astype(jnp.float32) / float(cfg.mask_length)
    n_active = (n_eff + jax.random.uniform(r_round, (batch,))).astype(jnp.int32)
    n_active = jnp.clip(n_active, cfg.min_masks, k)
    span_active = (
        jnp.arange(k, dtype=jnp.int32)[None, :] < n_active[:, None]
    )  # (B, K)

    pos = jnp.arange(seq_len, dtype=jnp.int32)[None, None, :]  # (1,1,T)
    in_span = (pos >= start[..., None]) & (pos < (start + span_len)[..., None])
    in_span = in_span & span_active[..., None]
    mask = in_span.any(axis=1)  # (B, T)
    # never mask padding
    mask = mask & (jnp.arange(seq_len)[None, :] < sz[:, None])
    return mask


def frame_padding_mask(
    sample_lengths: jax.Array,  # (B,) valid waveform lengths
    num_samples: int,
    num_frames: int,
) -> jax.Array:
    """(B, T_frames) bool mask, True = padded frame.

    Matches reference `forward_padding_mask` (/root/reference/WavLM/WavLM.py:
    311-321): frame i is padding iff *all* samples in its block of size
    num_samples // num_frames are padding.
    """
    block = num_samples // num_frames
    frame_idx = jnp.arange(num_frames, dtype=jnp.int32)[None, :]
    return frame_idx * block >= sample_lengths.astype(jnp.int32)[:, None]


def apply_time_mask(
    x: jax.Array,  # (B, T, D)
    mask: jax.Array,  # (B, T) bool
    mask_emb: jax.Array,  # (D,)
) -> jax.Array:
    """Replace masked positions with the learned mask embedding
    (reference `x[mask_indices] = self.mask_emb`, WavLM.py:286)."""
    return jnp.where(mask[..., None], mask_emb.astype(x.dtype)[None, None, :], x)


def apply_channel_mask(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Zero masked channels across all timesteps (WavLM.py:290-307).
    mask: (B, D) bool."""
    return jnp.where(mask[:, None, :], 0.0, x)


def sample_boundary_mask(
    rng: jax.Array,
    seg_ids: jax.Array,  # (B, T) int32 segment id per frame, -1 = none
    p: float = 0.5,
    max_segments: int = 512,
) -> jax.Array:
    """Boundary-aligned span masking (reference apply_mask boundary path,
    /root/reference/src/fairseq/models/wavlm/wavlm.py:360-377): each
    phone/word segment is masked i.i.d. with probability p; whole segments
    flip together.

    Shape-static device formulation: draw one Bernoulli per (row, segment id)
    and gather by the per-frame segment id. Frames with seg_id == -1 (no
    boundary info / padding) are never masked.
    """
    B, T = seg_ids.shape
    bern = jax.random.bernoulli(rng, p, (B, max_segments))
    safe = jnp.clip(seg_ids, 0, max_segments - 1)
    mask = jnp.take_along_axis(bern, safe, axis=1)
    return mask & (seg_ids >= 0)


def make_streaming_mask(
    T: int,
    chunk_size: int,
    left_chunks: int = -1,
    neg: float = -1e30,
) -> jax.Array:
    """(T, T) additive attention mask for chunked streaming attention
    (the reference's streaming_mask hook, wavlm.py:698,730): query frame t
    may attend within its chunk and up to `left_chunks` previous chunks
    (-1 = unlimited left context)."""
    frame_chunk = jnp.arange(T) // chunk_size
    q = frame_chunk[:, None]
    s = frame_chunk[None, :]
    allowed = s <= q
    if left_chunks >= 0:
        allowed = allowed & (s >= q - left_chunks)
    return jnp.where(allowed, 0.0, neg).astype(jnp.float32)


def frames_to_segments(boundaries_s, num_frames: int, frame_rate: float):
    """Host helper: per-utterance boundary timestamps (seconds) ->
    (num_frames,) int32 segment ids (-1 past the last boundary)."""
    import numpy as np

    ids = np.full((num_frames,), -1, np.int32)
    frames = [int(round(b * frame_rate)) for b in boundaries_s]
    for si, (a, b) in enumerate(zip(frames[:-1], frames[1:])):
        ids[max(a, 0) : min(b, num_frames)] = si
    return ids
