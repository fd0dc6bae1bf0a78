"""EEND-style speaker diarization on SSL features.

Reference behavior: /root/reference/downstreams/speaker_diarization/
models/models.py (TransformerDiarization: projection -> transformer ->
per-speaker sigmoid logits + speaker vectors) and diarization.py:18-110
(chunked inference -> AHC clustering of speaker vectors with cannot-link
constraints -> median filtering -> RTTM).

flax model + numpy inference utilities. Permutation-invariant BCE training
loss (PIT) included.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class DiarizationConfig:
    num_speakers: int = 3  # local speakers per chunk
    hidden_dim: int = 256
    num_layers: int = 4
    num_heads: int = 8
    ffn_dim: int = 1024
    emb_dim: int = 256  # speaker-vector dim
    dropout: float = 0.1


class DiarizationLayer(nn.Module):
    cfg: DiarizationConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask=None, deterministic=True):
        cfg = self.cfg
        h = nn.LayerNorm(param_dtype=jnp.float32)(x)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=cfg.num_heads, dtype=self.dtype, param_dtype=jnp.float32,
            deterministic=deterministic, dropout_rate=cfg.dropout,
        )
        mask = None
        if padding_mask is not None:
            ok = ~padding_mask
            mask = ok[:, None, None, :] & ok[:, None, :, None]
        x = x + attn(h, h, mask=mask)
        h = nn.LayerNorm(param_dtype=jnp.float32)(x)
        h = nn.Dense(cfg.ffn_dim, dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = nn.relu(h)
        h = nn.Dense(cfg.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32)(h)
        return x + h


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DiarizationOutput:
    logits: jax.Array  # (B, T, S) per-speaker activity logits
    spk_vectors: jax.Array  # (B, S, E) chunk-level speaker vectors


class TransformerDiarization(nn.Module):
    """models/models.py:TransformerDiarization equivalent."""

    cfg: DiarizationConfig = DiarizationConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        feats: jax.Array,  # (B, T, D) SSL features
        padding_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> DiarizationOutput:
        cfg = self.cfg
        x = nn.Dense(cfg.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="in_proj")(feats)
        for i in range(cfg.num_layers):
            x = DiarizationLayer(cfg, dtype=self.dtype, name=f"layer_{i}")(
                x, padding_mask, deterministic
            )
        x = nn.LayerNorm(param_dtype=jnp.float32, name="out_norm")(x)
        logits = nn.Dense(cfg.num_speakers, dtype=self.dtype,
                          param_dtype=jnp.float32, name="out_proj")(x)
        logits = logits.astype(jnp.float32)

        # speaker vectors: activity-weighted average of frame embeddings
        # projected per local speaker (diarization.py speaker-vector path)
        emb = nn.Dense(cfg.emb_dim * cfg.num_speakers, dtype=self.dtype,
                       param_dtype=jnp.float32, name="spk_proj")(x)
        B, T, _ = emb.shape
        emb = emb.reshape(B, T, cfg.num_speakers, cfg.emb_dim)
        act = jax.nn.sigmoid(logits)
        if padding_mask is not None:
            act = jnp.where(padding_mask[..., None], 0.0, act)
        denom = jnp.maximum(act.sum(axis=1), 1e-4)[..., None]  # (B, S, 1)
        spk = jnp.einsum("bts,btse->bse", act, emb) / denom
        return DiarizationOutput(logits=logits, spk_vectors=spk)


def pit_bce_loss(
    logits: jax.Array,  # (B, T, S)
    labels: jax.Array,  # (B, T, S) {0,1}
    padding_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Permutation-invariant BCE (EEND training objective): min over speaker
    permutations of summed per-frame BCE. Returns (loss_mean, best_perm)."""
    S = logits.shape[-1]
    valid = (
        jnp.ones(logits.shape[:2], jnp.float32)
        if padding_mask is None
        else (~padding_mask).astype(jnp.float32)
    )
    perms = list(itertools.permutations(range(S)))
    losses = []
    for perm in perms:
        lp = logits[..., list(perm)]
        bce = jnp.maximum(lp, 0) - lp * labels + jnp.log1p(jnp.exp(-jnp.abs(lp)))
        losses.append(jnp.sum(bce.sum(-1) * valid, axis=-1))  # (B,)
    all_losses = jnp.stack(losses, axis=-1)  # (B, P)
    best = jnp.argmin(all_losses, axis=-1)
    denom = jnp.maximum(valid.sum(-1) * S, 1.0)
    loss = jnp.mean(jnp.min(all_losses, axis=-1) / denom)
    return loss, best


# ---------------------------------------------------------------- inference
def ahc_cluster(
    vectors: np.ndarray,  # (N, E) chunk-speaker vectors
    threshold: float = 0.6,
    cannot_link: Optional[List[Tuple[int, int]]] = None,
) -> np.ndarray:
    """Average-linkage agglomerative clustering on cosine distance with
    cannot-link constraints (same-chunk speakers must differ —
    diarization.py:60-95). Returns cluster ids (N,)."""
    N = len(vectors)
    v = vectors / np.maximum(np.linalg.norm(vectors, axis=-1, keepdims=True), 1e-9)
    dist = 1.0 - v @ v.T
    forbidden = set()
    for a, b in cannot_link or []:
        forbidden.add((a, b))
        forbidden.add((b, a))
    clusters: List[List[int]] = [[i] for i in range(N)]

    def cluster_dist(ci, cj):
        return float(np.mean([dist[a, b] for a in ci for b in cj]))

    def linked(ci, cj):
        return any((a, b) in forbidden for a in ci for b in cj)

    while len(clusters) > 1:
        best, bi, bj = None, -1, -1
        for i in range(len(clusters)):
            for j in range(i + 1, len(clusters)):
                if linked(clusters[i], clusters[j]):
                    continue
                d = cluster_dist(clusters[i], clusters[j])
                if best is None or d < best:
                    best, bi, bj = d, i, j
        if best is None or best > threshold:
            break
        clusters[bi] = clusters[bi] + clusters[bj]
        del clusters[bj]
    ids = np.zeros(N, np.int32)
    for cid, members in enumerate(clusters):
        for m in members:
            ids[m] = cid
    return ids


def median_filter(activity: np.ndarray, width: int = 11) -> np.ndarray:
    """Per-speaker median smoothing of binary activity (diarization.py:100)."""
    if width <= 1:
        return activity
    pad = width // 2
    padded = np.pad(activity, ((pad, pad), (0, 0)), mode="edge")
    out = np.empty_like(activity)
    for t in range(activity.shape[0]):
        out[t] = np.median(padded[t : t + width], axis=0)
    return out


def to_rttm(
    activity: np.ndarray,  # (T, S) binary
    frame_shift_s: float,
    uri: str = "utt",
) -> str:
    """RTTM segment lines from frame activity (diarization.py RTTM writer)."""
    lines = []
    T, S = activity.shape
    for s in range(S):
        on = None
        for t in range(T + 1):
            a = activity[t, s] if t < T else 0
            if a and on is None:
                on = t
            elif not a and on is not None:
                start = on * frame_shift_s
                dur = (t - on) * frame_shift_s
                lines.append(
                    f"SPEAKER {uri} 1 {start:.3f} {dur:.3f} "
                    f"<NA> <NA> spk{s} <NA> <NA>"
                )
                on = None
    return "\n".join(lines)


def chunked_diarization(
    infer_fn,  # (T_c, D) feats -> (logits (T_c, S), spk_vectors (S, E))
    feats: np.ndarray,  # (T, D) full-recording SSL features
    chunk_size: int = 2000,
    threshold: float = 0.6,
    activity_floor: float = 0.05,
    median_width: int = 11,
) -> np.ndarray:
    """Full-recording diarization by chunking (diarization.py:18-110).

    Per chunk: local speaker activities + speaker vectors; local speakers
    with enough activity contribute a vector. AHC over all chunk-speaker
    vectors with same-chunk cannot-links assigns global speaker ids; local
    activities are stitched into a (T, n_global) activity matrix, then
    median-filtered. Returns the binary global activity matrix.
    """
    T = len(feats)
    chunks = [feats[i : i + chunk_size] for i in range(0, T, chunk_size)]
    vecs: List[np.ndarray] = []
    cannot: List[Tuple[int, int]] = []
    chunk_acts: List[np.ndarray] = []
    chunk_active: List[List[int]] = []
    for ch in chunks:
        logits, sv = infer_fn(ch)
        logits = np.asarray(logits, np.float32)
        sv = np.asarray(sv, np.float32)
        act = (1.0 / (1.0 + np.exp(-logits))) > 0.5  # (Tc, S)
        active = [
            s for s in range(act.shape[1])
            if act[:, s].mean() > activity_floor
        ]
        ids_here = []
        for s in active:
            ids_here.append(len(vecs))
            vecs.append(sv[s])
        for a in range(len(ids_here)):
            for b in range(a + 1, len(ids_here)):
                cannot.append((ids_here[a], ids_here[b]))
        chunk_acts.append(act)
        chunk_active.append(active)

    if not vecs:
        return np.zeros((T, 1), np.float32)
    ids = ahc_cluster(np.stack(vecs), threshold, cannot)
    n_global = int(ids.max()) + 1
    out = np.zeros((T, n_global), np.float32)
    pos, k = 0, 0
    for act, active in zip(chunk_acts, chunk_active):
        for s in active:
            out[pos : pos + len(act), ids[k]] = np.maximum(
                out[pos : pos + len(act), ids[k]], act[:, s]
            )
            k += 1
        pos += len(act)
    return (median_filter(out, median_width) > 0.5).astype(np.float32)


# ---------------------------------------------------------------- DER
def parse_rttm(text: str) -> List[Tuple[str, float, float, str]]:
    """[(uri, start, dur, speaker)] from RTTM lines."""
    out = []
    for line in text.splitlines():
        parts = line.split()
        if len(parts) < 8 or parts[0] != "SPEAKER":
            continue
        out.append((parts[1], float(parts[3]), float(parts[4]), parts[7]))
    return out


def _segments_to_activity(
    segs: List[Tuple[str, float, float, str]], frame_shift: float, T: int
) -> Tuple[np.ndarray, List[str]]:
    spks = sorted({s for _, _, _, s in segs})
    act = np.zeros((T, len(spks)), bool)
    for _, start, dur, spk in segs:
        a = int(round(start / frame_shift))
        b = int(round((start + dur) / frame_shift))
        act[a : min(b, T), spks.index(spk)] = True
    return act, spks


def compute_der(
    ref_rttm: str,
    hyp_rttm: str,
    frame_shift: float = 0.02,
) -> dict:
    """Frame-based diarization error rate with optimal speaker mapping
    (md-eval semantics without collar: DER = (miss + fa + confusion) /
    ref speech time). The reference scores with md-eval/dscore; this is the
    same frame decomposition in numpy.
    """
    ref_segs = parse_rttm(ref_rttm)
    hyp_segs = parse_rttm(hyp_rttm)
    end = 0.0
    for _, s, d, _ in ref_segs + hyp_segs:
        end = max(end, s + d)
    T = int(np.ceil(end / frame_shift)) + 1
    ref, ref_spk = _segments_to_activity(ref_segs, frame_shift, T)
    hyp, hyp_spk = _segments_to_activity(hyp_segs, frame_shift, T)

    # optimal ref->hyp speaker mapping by overlap (Hungarian via brute force
    # for small casts, greedy fallback beyond 8)
    overlap = ref.astype(np.int64).T @ hyp.astype(np.int64)  # (R, H)
    R, H = overlap.shape
    if 0 < R <= 8 and 0 < H <= 8:
        best_map, best_score = {}, -1
        for perm in itertools.permutations(range(H), min(R, H)):
            m = dict(zip(range(min(R, H)), perm))
            score = sum(overlap[r, h] for r, h in m.items())
            if score > best_score:
                best_score, best_map = score, m
    else:
        best_map = {}
        used = set()
        for r in np.argsort(-overlap.max(axis=1) if H else []):
            order = np.argsort(-overlap[r])
            for h in order:
                if h not in used:
                    best_map[int(r)] = int(h)
                    used.add(int(h))
                    break

    mapped_match = np.zeros(T)
    for r, h in best_map.items():
        mapped_match += ref[:, r] & hyp[:, h]
    n_ref = ref.sum(axis=1)
    n_hyp = hyp.sum(axis=1)
    miss = np.maximum(n_ref - n_hyp, 0).sum()
    fa = np.maximum(n_hyp - n_ref, 0).sum()
    conf = (np.minimum(n_ref, n_hyp) - mapped_match).sum()
    speech = max(n_ref.sum(), 1)
    return {
        "der": float((miss + fa + conf) / speech),
        "miss": float(miss / speech),
        "false_alarm": float(fa / speech),
        "confusion": float(conf / speech),
    }
