"""Multilingual temperature resampling (UniSpeech on CommonVoice).

Reference behavior (/root/reference/src/fairseq/tasks/audio_pretraining.py:
211-219, 270-308): per-language sampling probability p_l ∝ n_l^alpha
(normalized), size ratio r_l = p_l * N / n_l, and per-epoch uniform draws of
ceil(n_l * r_l) rows per language — with replacement when r_l >= 1
(ResamplingDataset semantics, resampling_dataset.py:82-117). alpha < 1
upsamples low-resource languages.

TPU-era packaging: instead of wrapper datasets, the per-epoch resampled row
multiset is a pure function of (seed, epoch, language) folded into the
iterator's epoch plan, so it stays checkpointable via (epoch, batch_offset)
alone.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from unispeech_tpu.data.manifest import Manifest


def multilang_sample_probs(lengths: np.ndarray, alpha: float) -> np.ndarray:
    """p_l ∝ (n_l / N)^alpha, normalized (_get_sample_prob,
    audio_pretraining.py:211-219)."""
    lengths = np.asarray(lengths, dtype=np.float64)
    prob = lengths / lengths.sum()
    smoothed = prob**alpha
    return smoothed / smoothed.sum()


def multilang_size_ratios(lengths: np.ndarray, alpha: float) -> np.ndarray:
    """r_l = p_l * N / n_l (audio_pretraining.py:293)."""
    lengths = np.asarray(lengths, dtype=np.float64)
    return multilang_sample_probs(lengths, alpha) * lengths.sum() / lengths


def concat_manifests(
    manifests: Sequence[Manifest],
) -> Tuple[Manifest, List[np.ndarray]]:
    """Concatenate per-language manifests into one (ConcatDataset analog).

    Returns the combined manifest (paths made root-absolute so differing
    roots coexist) and per-language row-index arrays into it.
    """
    import os

    paths: List[str] = []
    sizes: List[np.ndarray] = []
    groups: List[np.ndarray] = []
    off = 0
    for m in manifests:
        paths.extend(os.path.join(m.root, p) for p in m.paths)
        sizes.append(np.asarray(m.sizes))
        groups.append(np.arange(off, off + len(m)))
        off += len(m)
    return (
        Manifest(root="", paths=paths, sizes=np.concatenate(sizes) if sizes else np.zeros(0, np.int64)),
        groups,
    )


def resampled_rows(
    rows: np.ndarray,
    size_ratio: float,
    seed: int,
    epoch: int,
    lang_id: int,
) -> np.ndarray:
    """One language's per-epoch row multiset: ceil(n*r) uniform draws, with
    replacement iff r >= 1 (resampling_dataset.py:300-306 call site)."""
    n = len(rows)
    if n == 0:
        return rows
    m = int(np.ceil(n * size_ratio))
    rng = np.random.default_rng(np.random.SeedSequence([seed, epoch, lang_id, 6007]))
    if size_ratio >= 1.0:
        picks = rng.integers(0, n, m)
    else:
        picks = rng.choice(n, size=m, replace=False)
    return rows[picks]
