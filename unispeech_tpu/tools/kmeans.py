"""HuBERT/WavLM label pipeline: feature dump -> k-means -> frame labels.

Replaces the reference's simple_kmeans tooling
(/root/reference/src/examples/hubert/simple_kmeans/: dump_mfcc_feature.py,
dump_hubert_feature.py:35-82, learn_kmeans.py:25-40 (sklearn
MiniBatchKMeans), dump_km_label.py:25-53) with a JAX-native pipeline:

  * MFCC-39 (13 mfcc + delta + ddelta @ 100 Hz) in numpy for iteration 1.
  * model feature dumping chunked at `max_chunk` samples like the reference
    HubertFeatureReader (dump_hubert_feature.py:36-80).
  * mini-batch k-means on device: per-center count-weighted running mean
    (sklearn MiniBatchKMeans's update rule) with k-means++ style init,
    batched distance argmin on the MXU.
  * ApplyKmeans = nearest-centroid argmin via one matmul.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Callable, Iterable, Iterator, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


# --------------------------------------------------------------------- MFCC
def mfcc_39(
    wav: np.ndarray,  # (n,) fp32 16 kHz
    sample_rate: int = 16_000,
    n_mfcc: int = 13,
    frame_ms: float = 25.0,
    hop_ms: float = 10.0,
    n_mels: int = 23,
    n_fft: int = 512,
) -> np.ndarray:
    """(T, 39) MFCC + delta + ddelta at 100 Hz (reference iter-1 features,
    dump_mfcc_feature.py uses torchaudio kaldi-compliant mfcc; this is a
    standard HTK-style equivalent — labels need consistency, not parity)."""
    frame = int(sample_rate * frame_ms / 1000)
    hop = int(sample_rate * hop_ms / 1000)
    if len(wav) < frame:
        wav = np.pad(wav, (0, frame - len(wav)))
    n_frames = 1 + (len(wav) - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = wav[idx] * np.hanning(frame)[None, :]
    spec = np.abs(np.fft.rfft(frames, n_fft, axis=-1)) ** 2  # (T, F)

    # mel filterbank
    def hz2mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel2hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    mel_pts = mel2hz(np.linspace(hz2mel(20.0), hz2mel(sample_rate / 2), n_mels + 2))
    bins = np.floor((n_fft + 1) * mel_pts / sample_rate).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for m in range(1, n_mels + 1):
        l, c, r = bins[m - 1], bins[m], bins[m + 1]
        if c > l:
            fb[m - 1, l:c] = (np.arange(l, c) - l) / (c - l)
        if r > c:
            fb[m - 1, c:r] = (r - np.arange(c, r)) / (r - c)
    logmel = np.log(np.maximum(spec @ fb.T, 1e-10))  # (T, n_mels)

    # DCT-II orthonormal -> first n_mfcc coefficients
    k = np.arange(n_mels)
    dct = np.cos(np.pi * np.outer(np.arange(n_mfcc), 2 * k + 1) / (2 * n_mels))
    dct *= np.sqrt(2.0 / n_mels)
    dct[0] /= np.sqrt(2.0)
    mfcc = logmel @ dct.T  # (T, n_mfcc)

    def delta(x, width: int = 2):
        pad = np.pad(x, ((width, width), (0, 0)), mode="edge")
        num = sum(i * (pad[width + i : len(x) + width + i] -
                       pad[width - i : len(x) + width - i]) for i in range(1, width + 1))
        den = 2 * sum(i * i for i in range(1, width + 1))
        return num / den

    d1 = delta(mfcc)
    d2 = delta(d1)
    return np.concatenate([mfcc, d1, d2], axis=-1).astype(np.float32)


# --------------------------------------------------- model feature dumping
def dump_model_features(
    apply_fn: Callable[[np.ndarray], np.ndarray],  # (1, n) wav -> (T, D) feats
    wavs: Iterable[np.ndarray],
    max_chunk: int = 1_600_000,
) -> Iterator[np.ndarray]:
    """Chunked feature extraction (HubertFeatureReader.get_feats,
    dump_hubert_feature.py:36-80): long audio is split at max_chunk samples
    and the per-chunk features concatenated."""
    for wav in wavs:
        chunks = []
        for s in range(0, len(wav), max_chunk):
            x = wav[s : s + max_chunk][None, :]
            chunks.append(np.asarray(apply_fn(x)))
        yield np.concatenate(chunks, axis=0)


# ------------------------------------------------------------- k-means
@dataclass
class KmeansModel:
    centroids: np.ndarray  # (K, D) fp32

    def save(self, path: str) -> None:
        np.save(path, self.centroids)

    @classmethod
    def load(cls, path: str) -> "KmeansModel":
        return cls(np.load(path))


def _assign(x, centroids):
    """Nearest centroid per row — one MXU matmul + argmin.
    dist^2 = |x|^2 - 2 x.c + |c|^2; |x|^2 constant per row, dropped."""
    import jax.numpy as jnp

    c2 = jnp.sum(centroids**2, -1)
    scores = 2.0 * (x @ centroids.T) - c2[None, :]
    return jnp.argmax(scores, axis=-1)


def _kmeanspp_init(
    x: np.ndarray, k: int, rng: np.random.Generator, subsample: int = 100_000
) -> np.ndarray:
    """k-means++ seeding (the sklearn default the reference relies on):
    first center uniform, then proportional to squared distance to the
    nearest chosen center."""
    if len(x) > subsample:
        x = x[rng.choice(len(x), subsample, replace=False)]
    if len(x) < k:
        x = np.concatenate([x] * (k // len(x) + 1), axis=0)
    centers = np.empty((k, x.shape[1]), np.float32)
    centers[0] = x[rng.integers(len(x))]
    d2 = np.sum((x - centers[0]) ** 2, -1)
    for i in range(1, k):
        p = d2 / max(d2.sum(), 1e-12)
        centers[i] = x[rng.choice(len(x), p=p)]
        d2 = np.minimum(d2, np.sum((x - centers[i]) ** 2, -1))
    return centers


def learn_kmeans(
    feature_batches: Iterable[np.ndarray],  # (n_i, D) batches, one pass/epoch
    n_clusters: int,
    seed: int = 0,
    epochs: int = 1,
    init_batch: Optional[np.ndarray] = None,
) -> KmeansModel:
    """Mini-batch k-means (sklearn MiniBatchKMeans semantics: per-center
    count-weighted running mean — learn_kmeans.py:25-40)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    batches = list(feature_batches)
    assert batches, "no features"
    if init_batch is None:
        init_batch = np.concatenate(batches[: max(1, len(batches) // 4)], axis=0)
    centroids = jnp.asarray(
        _kmeanspp_init(init_batch.astype(np.float32), n_clusters, rng), jnp.float32
    )
    counts = jnp.ones((n_clusters,), jnp.float32)

    @jax.jit
    def update(centroids, counts, x):
        a = _assign(x, centroids)  # (n,)
        onehot = jax.nn.one_hot(a, n_clusters, dtype=jnp.float32)  # (n, K)
        batch_counts = onehot.sum(0)  # (K,)
        batch_sums = onehot.T @ x  # (K, D)
        new_counts = counts + batch_counts
        lr = batch_counts / jnp.maximum(new_counts, 1.0)
        batch_means = batch_sums / jnp.maximum(batch_counts[:, None], 1.0)
        new_centroids = centroids + lr[:, None] * (batch_means - centroids)
        return new_centroids, new_counts

    for ep in range(epochs):
        order = rng.permutation(len(batches))
        for bi in order:
            x = jnp.asarray(batches[bi], jnp.float32)
            centroids, counts = update(centroids, counts, x)
        logger.info("kmeans epoch %d done", ep)
    return KmeansModel(np.asarray(centroids))


def apply_kmeans(
    model: KmeansModel, features: np.ndarray  # (T, D)
) -> np.ndarray:
    """Frame labels = nearest centroid (ApplyKmeans, dump_km_label.py:25-53)."""
    import jax.numpy as jnp

    return np.asarray(_assign(jnp.asarray(features, jnp.float32),
                              jnp.asarray(model.centroids)))


def write_label_file(path: str, label_seqs: Iterable[np.ndarray]) -> None:
    """One space-separated line per utterance (.km format)."""
    with open(path, "w", encoding="utf-8") as f:
        for labs in label_seqs:
            f.write(" ".join(str(int(x)) for x in labs) + "\n")
