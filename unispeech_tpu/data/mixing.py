"""Utterance / noise mixing augmentation (UniSpeech-SAT, WavLM denoising).

Reference behavior: `mixing_collated_audios`
(/root/reference/src/fairseq/data/audio/utterance_mixing_dataset.py:373-438):
with prob `mixing_prob` per utterance, overlay `mixing_num` clips — each
either another utterance of the batch (uniform over B, self included,
SNR ~ U(-5,5) dB) or a noise-store clip (SNR ~ U(-5,20) dB) — where the clip
length is U{0..T//2}, clip and target positions are uniform, the scale is
sqrt(ref_pow / (src_pow * 10^(snr/10))) over FULL-utterance mean powers, and
the mixed row is layer-normalized afterwards iff the dataset normalizes.

Noise store: a JSON list of {"loc": "h5path\tkey\tstart\tend"} entries over
h5py files holding one int16 "wav" dataset
(utterance_mixing_dataset.py:214-218, 385-391). `NoiseStore` reads that
format and additionally accepts a plain TSV manifest of audio files
(root + "relpath\tnsamples" lines) for h5py-free setups.

Two mixers with identical math:
  * `mix_batch_host`  — numpy, reference-parity, runs in the collater.
  * `mix_batch_device`— pure-JAX keyed-RNG version of the same math for
    in-step on-device augmentation (deterministic across hosts; noise clips
    must be pre-cut to a fixed length).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class MixingConfig:
    """Knobs of utterance_mixing_pretraining task config
    (utterance_mixing_pretraining.py:103-133)."""

    mixing_prob: float = 0.2
    mixing_num: int = 1  # overlays per chosen utterance
    # reference: mixing_max_len < 0 -> T//2, else T//mixing_max_len
    mixing_max_len: int = -1
    source_snr_low: float = -5.0  # utterance-mix SNR range (dB)
    source_snr_high: float = 5.0
    noise_snr_low: float = -5.0  # noise-mix SNR range (dB)
    noise_snr_high: float = 20.0
    mixing_noise_prob: float = 0.0  # probability a mix uses noise
    mixing_noise_num: int = 1
    normalize_after: bool = False  # layer-norm mixed rows (dataset.normalize)

    def max_overlap(self, T: int) -> int:
        m = T // 2 if self.mixing_max_len < 0 else T // self.mixing_max_len
        return min(m, T)


class NoiseStore:
    """Noise-clip source for denoising pretraining.

    Accepts the reference's JSON-of-h5py-slices format
    (utterance_mixing_dataset.py:214-218) or a TSV manifest of audio files
    (same format as data/manifest.py). Clips load lazily; h5py files stay
    open in a handle cache like the reference's noise_container.
    """

    def __init__(self, path: str):
        self.path = path
        self._h5 = {}
        if path.endswith(".json"):
            self.entries = json.load(open(path))
            self.kind = "h5"
        else:
            from unispeech_tpu.data.manifest import Manifest

            self.manifest = Manifest.load(path)
            self.entries = list(range(len(self.manifest)))
            self.kind = "tsv"

    def __len__(self) -> int:
        return len(self.entries)

    def get(self, i: int) -> np.ndarray:
        if self.kind == "h5":
            import h5py  # optional dep, only for reference-format stores

            path, key, start, end = self.entries[i]["loc"].split("\t")
            if path not in self._h5:
                self._h5[path] = h5py.File(path, "r")["wav"]
            clip = self._h5[path][int(start) : int(end)]
            return clip.astype(np.float32) / np.iinfo(np.int16).max
        from unispeech_tpu.data.manifest import load_audio

        return load_audio(self.manifest.abspath(i))

    def sample(self, rng: np.random.Generator, n: int) -> List[np.ndarray]:
        return [self.get(int(rng.integers(0, len(self)))) for _ in range(n)]

    def precut(self, rng: np.random.Generator, n: int, length: int) -> np.ndarray:
        """(n, length) fixed-shape clips for the device-side mixer."""
        out = np.zeros((n, length), np.float32)
        for r in range(n):
            clip = self.get(int(rng.integers(0, len(self))))
            if len(clip) >= length:
                s = int(rng.integers(0, len(clip) - length + 1))
                out[r] = clip[s : s + length]
            else:
                out[r, : len(clip)] = clip
        return out


def _layer_norm_1d(x: np.ndarray) -> np.ndarray:
    return (x - x.mean()) / np.sqrt(x.var() + 1e-5)


def mix_batch_host(
    rng: np.random.Generator,
    audio: np.ndarray,  # (B, T) float32
    lengths: Optional[np.ndarray],
    cfg: MixingConfig,
    noise: Optional[NoiseStore] = None,
    noise_clips: Optional[Sequence[np.ndarray]] = None,
) -> np.ndarray:
    """Numpy reference-parity collater-side mixing
    (utterance_mixing_dataset.py:373-438; `lengths` unused by the reference —
    kept for API symmetry with the device mixer)."""
    B, T = audio.shape
    out = audio.copy()
    max_len = cfg.max_overlap(T)

    def overlay(i: int, src: np.ndarray) -> None:
        src_T = len(src)
        c_len = min(int(rng.integers(0, max_len + 1)), src_T)
        c_end = int(rng.integers(c_len, src_T + 1))
        c_start = c_end - c_len
        s_end = int(rng.integers(c_len, T + 1))
        s_start = s_end - c_len
        out[i, s_start:s_end] += src[c_start:c_end]

    for i in range(B):
        if rng.random() >= cfg.mixing_prob:
            continue
        use_noise = (
            (noise is not None or noise_clips is not None)
            and rng.random() < cfg.mixing_noise_prob
        )
        if use_noise:
            if noise_clips is not None:
                picks = [
                    noise_clips[int(rng.integers(0, len(noise_clips)))]
                    for _ in range(cfg.mixing_noise_num)
                ]
            else:
                picks = noise.sample(rng, cfg.mixing_noise_num)
            for clip in picks:
                ref_pow = float(np.mean(out[i] ** 2))
                src_pow = float(np.mean(clip**2))
                if src_pow == 0:
                    scale = 0.0
                else:
                    snr = rng.uniform(cfg.noise_snr_low, cfg.noise_snr_high)
                    scale = (ref_pow / (src_pow * 10 ** (snr / 10))) ** 0.5
                overlay(i, clip * scale)
        else:
            choices = rng.integers(0, B, size=cfg.mixing_num)  # self included
            for c in choices:
                ref_pow = float(np.mean(out[i] ** 2))
                src_pow = float(np.mean(audio[c] ** 2))
                if src_pow == 0:
                    scale = 0.0
                else:
                    snr = rng.uniform(cfg.source_snr_low, cfg.source_snr_high)
                    scale = (ref_pow / (src_pow * 10 ** (snr / 10))) ** 0.5
                overlay(i, audio[c] * scale)
        if cfg.normalize_after:
            out[i] = _layer_norm_1d(out[i])
    return out


def mix_batch_device(
    rng: jax.Array,
    audio: jax.Array,  # (B, T)
    lengths: Optional[jax.Array],  # (B,) or None (unused; API symmetry)
    cfg: MixingConfig,
    noise: Optional[jax.Array] = None,  # (N, T) pre-cut noise clips
) -> jax.Array:
    """Keyed, jit-compatible version of the same mixing math.

    One overlay per row (mixing_num=1 — the recipes' setting); noise clips
    must be pre-cut to length T (NoiseStore.precut). Scales use
    full-utterance mean powers like the reference.
    """
    B, T = audio.shape
    max_len = cfg.max_overlap(T)
    keys = jax.random.split(rng, 8)
    k_sel, k_noise, k_part, k_len, k_cpos, k_spos, k_snr, k_nidx = keys

    do_mix = jax.random.uniform(k_sel, (B,)) < cfg.mixing_prob
    has_noise = noise is not None
    use_noise = (
        (jax.random.uniform(k_noise, (B,)) < cfg.mixing_noise_prob)
        if has_noise
        else jnp.zeros((B,), bool)
    )

    part = jax.random.randint(k_part, (B,), 0, B)  # self included (reference)
    src = audio[part]
    if has_noise:
        nidx = jax.random.randint(k_nidx, (B,), 0, noise.shape[0])
        src = jnp.where(use_noise[:, None], noise[nidx], src)

    c_len = jax.random.randint(k_len, (B,), 0, max_len + 1)
    # c_end ~ U{c_len..T}; start positions via uniform in the residual span
    u_c = jax.random.uniform(k_cpos, (B,))
    u_s = jax.random.uniform(k_spos, (B,))
    c_start = (u_c * (T - c_len + 1)).astype(jnp.int32)
    s_start = (u_s * (T - c_len + 1)).astype(jnp.int32)

    snr_u = jax.random.uniform(k_snr, (B,))
    snr_speech = cfg.source_snr_low + snr_u * (
        cfg.source_snr_high - cfg.source_snr_low
    )
    snr_noise = cfg.noise_snr_low + snr_u * (
        cfg.noise_snr_high - cfg.noise_snr_low
    )
    snr = jnp.where(use_noise, snr_noise, snr_speech)

    ref_pow = jnp.mean(audio**2, -1)
    src_pow = jnp.mean(src**2, -1)
    scale = jnp.where(
        src_pow > 0,
        jnp.sqrt(ref_pow / jnp.maximum(src_pow * 10 ** (snr / 10), 1e-10)),
        0.0,
    )

    # shift src so that src[c_start] lands at target position s_start
    t = jnp.arange(T)[None, :]
    region = (t >= s_start[:, None]) & (t < (s_start + c_len)[:, None])
    shift = s_start - c_start
    src_shifted = jax.vmap(lambda s, sh: jnp.roll(s, sh))(src, shift)

    mixed = audio + jnp.where(region, src_shifted, 0.0) * scale[:, None]
    if cfg.normalize_after:
        mean = mixed.mean(-1, keepdims=True)
        var = mixed.var(-1, keepdims=True)
        mixed = (mixed - mean) * jax.lax.rsqrt(var + 1e-5)

    return jnp.where(do_mix[:, None], mixed, audio)
