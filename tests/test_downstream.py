"""Downstream heads: ECAPA-TDNN speaker verification + EEND diarization."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from unispeech_tpu.downstream.diarization import (
    DiarizationConfig,
    TransformerDiarization,
    ahc_cluster,
    median_filter,
    pit_bce_loss,
    to_rttm,
)
from unispeech_tpu.downstream.ecapa_tdnn import (
    EcapaConfig,
    EcapaTdnn,
    compute_eer,
    cosine_score,
)


def test_ecapa_forward_and_scoring():
    cfg = EcapaConfig(channels=64, emb_dim=32, scale=4, num_layer_feats=3)
    model = EcapaTdnn(cfg)
    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, (3, 2, 50, 16))  # (L, B, T, D)
    pad = jnp.zeros((2, 50), bool)
    variables = model.init(rng, feats, pad)
    emb = model.apply(variables, feats, pad)
    assert emb.shape == (2, 32)
    assert np.isfinite(np.asarray(emb)).all()
    s = cosine_score(emb[0], emb[0])
    assert float(s) == 1.0 or abs(float(s) - 1.0) < 1e-5
    # padding must not change the embedding: zero-padded frames masked out
    feats2 = feats.at[:, :, 40:, :].set(99.0)
    pad2 = pad.at[:, 40:].set(True)
    e1 = model.apply(variables, feats.at[:, :, 40:, :].set(0.0), pad2)
    e2 = model.apply(variables, feats2, pad2)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), rtol=1e-4)


def test_eer_perfect_and_random():
    scores = np.asarray([0.9, 0.8, 0.1, 0.2])
    labels = np.asarray([1, 1, 0, 0])
    assert compute_eer(scores, labels) == 0.0
    assert compute_eer(1 - scores, labels) >= 0.5


def test_diarization_forward_and_pit():
    cfg = DiarizationConfig(num_speakers=2, hidden_dim=32, num_layers=1,
                            num_heads=4, ffn_dim=64, emb_dim=16)
    model = TransformerDiarization(cfg)
    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, (2, 40, 24))
    variables = model.init(rng, feats)
    out = model.apply(variables, feats)
    assert out.logits.shape == (2, 40, 2)
    assert out.spk_vectors.shape == (2, 2, 16)

    # PIT picks the permutation-invariant minimum
    labels = jnp.zeros((2, 40, 2)).at[:, :20, 0].set(1.0).at[:, 20:, 1].set(1.0)
    logits_good = (labels * 2 - 1) * 5.0
    logits_swapped = logits_good[..., ::-1]
    l1, _ = pit_bce_loss(logits_good, labels)
    l2, _ = pit_bce_loss(logits_swapped, labels)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_ahc_and_rttm():
    rng = np.random.default_rng(0)
    a = rng.standard_normal(8) + np.asarray([5.0] + [0.0] * 7)
    b = rng.standard_normal(8) + np.asarray([0.0] * 7 + [5.0])
    vectors = np.stack([a, a + 0.01, b, b + 0.01])
    ids = ahc_cluster(vectors, threshold=0.5)
    assert ids[0] == ids[1] and ids[2] == ids[3] and ids[0] != ids[2]
    # cannot-link keeps same-chunk speakers apart
    ids2 = ahc_cluster(vectors, threshold=2.0, cannot_link=[(0, 1)])
    assert ids2[0] != ids2[1]

    act = np.zeros((10, 2))
    act[2:6, 0] = 1
    rttm = to_rttm(act, frame_shift_s=0.02)
    assert "SPEAKER utt 1 0.040 0.080" in rttm

    noisy = act.copy()
    noisy[3, 0] = 0  # single-frame dropout
    sm = median_filter(noisy, width=3)
    assert sm[3, 0] == 1
