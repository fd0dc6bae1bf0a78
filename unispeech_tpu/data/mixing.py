"""Utterance / noise mixing augmentation (UniSpeech-SAT, WavLM).

Reference behavior: `mixing_collated_audios`
(/root/reference/src/fairseq/data/audio/utterance_mixing_dataset.py:373-438):
with prob `mixing_prob` per utterance, overlay either another utterance from
the batch or a noise clip, over a random region of length <= T/2, scaled to a
random SNR (utterance: -5..5 dB, noise: -5..20 dB), then renormalize to the
original energy.

Two implementations:
  * `mix_batch_device` — the TPU-idiomatic one: pure-JAX, keyed RNG, runs
    inside the jitted train step (deterministic across hosts; the hot host
    loop of the reference collater moves onto the chip).
  * `mix_batch_host` — numpy, byte-matching the same math for tests and for
    CPU input pipelines.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class MixingConfig:
    """Knobs of utterance_mixing_pretraining task config
    (utterance_mixing_pretraining.py:103-133)."""

    mixing_prob: float = 0.2
    mixing_max_len: float = 0.5  # max overlap as a fraction of T (ref: T//2)
    source_snr_low: float = -5.0  # utterance-mix SNR range (dB)
    source_snr_high: float = 5.0
    noise_snr_low: float = -5.0  # noise-mix SNR range (dB)
    noise_snr_high: float = 20.0
    noise_prob: float = 0.0  # probability a mix uses noise instead of speech


def _snr_scale(energy_tgt, energy_src, snr_db):
    """Scale for src so that 10*log10(E_tgt / (s^2 E_src)) == snr_db."""
    ratio = energy_tgt / jnp.maximum(energy_src, 1e-10)
    return jnp.sqrt(ratio * (10.0 ** (-snr_db / 10.0)))


def mix_batch_device(
    rng: jax.Array,
    audio: jax.Array,  # (B, T)
    lengths: Optional[jax.Array],  # (B,) or None
    cfg: MixingConfig,
    noise: Optional[jax.Array] = None,  # (N, T) pre-cut noise clips
) -> jax.Array:
    """Keyed, jit-compatible utterance/noise mixing."""
    B, T = audio.shape
    if lengths is None:
        lengths = jnp.full((B,), T, jnp.int32)
    k_sel, k_part, k_pos, k_snr, k_noise, k_nidx, k_start = jax.random.split(rng, 7)

    do_mix = jax.random.uniform(k_sel, (B,)) < cfg.mixing_prob
    use_noise = (
        (jax.random.uniform(k_noise, (B,)) < cfg.noise_prob)
        if noise is not None
        else jnp.zeros((B,), bool)
    )

    # mixing partner: another row of the batch (uniform, != self)
    part = jax.random.randint(k_part, (B,), 0, B - 1)
    part = part + (part >= jnp.arange(B))
    src_speech = audio[part]
    src_len_speech = lengths[part]

    if noise is not None:
        nidx = jax.random.randint(k_nidx, (B,), 0, noise.shape[0])
        src = jnp.where(use_noise[:, None], noise[nidx], src_speech)
        src_len = jnp.where(use_noise, noise.shape[1], src_len_speech)
    else:
        src, src_len = src_speech, src_len_speech

    # overlap region: length <= mixing_max_len * valid, random start within
    # the valid span of the target (reference: c_length = rand(0, T//2),
    # start = rand(0, T - c_length))
    max_len = (cfg.mixing_max_len * lengths).astype(jnp.int32)
    max_len = jnp.minimum(max_len, src_len.astype(jnp.int32))
    u = jax.random.uniform(k_pos, (B, 2))
    mix_len = (u[:, 0] * jnp.maximum(max_len, 1)).astype(jnp.int32)
    start = (u[:, 1] * jnp.maximum(lengths - mix_len, 1)).astype(jnp.int32)

    t = jnp.arange(T)[None, :]
    region = (t >= start[:, None]) & (t < (start + mix_len)[:, None])

    snr_u = jax.random.uniform(k_snr, (B,))
    snr_speech = cfg.source_snr_low + snr_u * (cfg.source_snr_high - cfg.source_snr_low)
    snr_noise = cfg.noise_snr_low + snr_u * (cfg.noise_snr_high - cfg.noise_snr_low)
    snr = jnp.where(use_noise, snr_noise, snr_speech)

    # shift source so its clip starts at the region start
    src_start = (jax.random.uniform(k_start, (B,))
                 * jnp.maximum(src_len - mix_len, 1)).astype(jnp.int32)
    shift = start - src_start
    src_shifted = jax.vmap(lambda s, sh: jnp.roll(s, sh))(src, shift)

    e_tgt = jnp.sum(jnp.where(region, audio, 0.0) ** 2, -1)
    e_src = jnp.sum(jnp.where(region, src_shifted, 0.0) ** 2, -1)
    scale = _snr_scale(e_tgt, e_src, snr)

    mixed = audio + jnp.where(region, src_shifted, 0.0) * scale[:, None]
    # renormalize to original max amplitude (reference renormalizes after mix)
    peak_before = jnp.max(jnp.abs(audio), -1)
    peak_after = jnp.max(jnp.abs(mixed), -1)
    gain = jnp.where(
        peak_after > 1e-8, peak_before / jnp.maximum(peak_after, 1e-8), 1.0
    )
    mixed = mixed * gain[:, None]

    apply = do_mix & (mix_len > 0)
    return jnp.where(apply[:, None], mixed, audio)


def mix_batch_host(
    rng: np.random.Generator,
    audio: np.ndarray,  # (B, T) float32
    lengths: Optional[np.ndarray],
    cfg: MixingConfig,
    noise: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Numpy reference-parity collater-side mixing."""
    B, T = audio.shape
    out = audio.copy()
    if lengths is None:
        lengths = np.full((B,), T, np.int64)
    for i in range(B):
        if rng.random() >= cfg.mixing_prob:
            continue
        use_noise = noise is not None and rng.random() < cfg.noise_prob
        if use_noise:
            src = noise[rng.integers(0, len(noise))]
            lo, hi = cfg.noise_snr_low, cfg.noise_snr_high
        else:
            j = rng.integers(0, B - 1)
            j = j + (j >= i)
            src = audio[j][: lengths[j]]
            lo, hi = cfg.source_snr_low, cfg.source_snr_high
        li = int(lengths[i])
        max_len = int(min(cfg.mixing_max_len * li, len(src)))
        if max_len < 1:
            continue
        mix_len = int(rng.integers(0, max_len)) if max_len > 1 else 1
        if mix_len == 0:
            continue
        start = int(rng.integers(0, max(li - mix_len, 1)))
        s0 = int(rng.integers(0, max(len(src) - mix_len, 1)))
        clip = src[s0 : s0 + mix_len]
        snr = lo + rng.random() * (hi - lo)
        e_tgt = float(np.sum(out[i, start : start + mix_len] ** 2))
        e_src = float(np.sum(clip**2))
        scale = np.sqrt(max(e_tgt, 1e-10) / max(e_src, 1e-10) * 10 ** (-snr / 10))
        peak_before = np.max(np.abs(out[i])) or 1.0
        out[i, start : start + mix_len] += clip * scale
        peak_after = np.max(np.abs(out[i]))
        if peak_after > 1e-8:
            out[i] *= peak_before / peak_after
    return out
