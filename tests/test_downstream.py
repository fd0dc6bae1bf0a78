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


def test_ecapa_batchnorm_running_stats():
    """Real BatchNorm semantics (reference BatchNorm1d, ecapa_tdnn.py:24):
    train mode mutates batch_stats; eval uses the running averages."""
    cfg = EcapaConfig(channels=64, emb_dim=32, scale=4, num_layer_feats=3)
    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, (3, 2, 50, 16))
    train_model = EcapaTdnn(cfg, train=True)
    variables = train_model.init(rng, feats)
    assert "batch_stats" in variables, "BatchNorm must track running stats"
    _, updated = train_model.apply(variables, feats, mutable=["batch_stats"])
    stats0 = jax.tree_util.tree_leaves(variables["batch_stats"])
    stats1 = jax.tree_util.tree_leaves(updated["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(stats0, stats1)
    ), "train mode must update running stats"
    # eval mode: no mutation needed, deterministic
    eval_model = EcapaTdnn(cfg, train=False)
    e1 = eval_model.apply(variables, feats)
    e2 = eval_model.apply(variables, feats)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_chunked_diarization_stitches_speakers():
    from unispeech_tpu.downstream.diarization import chunked_diarization

    rng = np.random.default_rng(0)
    E = 8
    spk_a, spk_b = rng.standard_normal(E), rng.standard_normal(E)

    def infer_fn(chunk):
        # chunk features: col0 marks speaker A activity, col1 speaker B
        T = len(chunk)
        logits = np.full((T, 2), -10.0, np.float32)
        logits[chunk[:, 0] > 0, 0] = 10.0
        logits[chunk[:, 1] > 0, 1] = 10.0
        return logits, np.stack([spk_a, spk_b])

    feats = np.zeros((200, 4), np.float32)
    feats[:80, 0] = 1.0  # A talks frames 0-79
    feats[120:, 1] = 1.0  # B talks frames 120-199
    act = chunked_diarization(
        infer_fn, feats, chunk_size=50, threshold=0.5, median_width=1
    )
    # the same speaker across chunks must collapse to one global id
    assert act.shape[1] == 2
    on_a = act[:80].sum(axis=0).argmax()
    on_b = act[120:].sum(axis=0).argmax()
    assert on_a != on_b
    assert act[:80, on_a].mean() > 0.9
    assert act[120:, on_b].mean() > 0.9


def test_der_identical_and_disjoint():
    from unispeech_tpu.downstream.diarization import compute_der

    ref = "\n".join([
        "SPEAKER u 1 0.000 2.000 <NA> <NA> alice <NA> <NA>",
        "SPEAKER u 1 3.000 1.000 <NA> <NA> bob <NA> <NA>",
    ])
    same = compute_der(ref, ref.replace("alice", "x").replace("bob", "y"))
    assert same["der"] < 1e-6  # renamed speakers map optimally
    miss_all = compute_der(ref, "")
    assert abs(miss_all["der"] - 1.0) < 1e-6
    assert abs(miss_all["miss"] - 1.0) < 1e-6
    # half-overlap: one of two seconds of alice hypothesized
    hyp = "SPEAKER u 1 0.000 1.000 <NA> <NA> spk0 <NA> <NA>"
    half = compute_der(ref, hyp)
    assert half["false_alarm"] < 1e-6
    assert abs(half["miss"] - 2.0 / 3.0) < 0.02


def test_verification_cli_smoke(tmp_path):
    import json as jsonlib
    import wave

    from unispeech_tpu.downstream.verification import main as ver_main
    from unispeech_tpu.train.checkpoint import save_params_npz
    from unispeech_tpu.configs import EncoderConfig
    from unispeech_tpu.models.wavlm import WavLM, WavLMModelConfig

    tiny = dict(
        encoder_layers=2, encoder_embed_dim=64, encoder_ffn_embed_dim=128,
        encoder_attention_heads=4, conv_layers=[[32, 10, 5], [32, 3, 2]],
        conv_pos=16, conv_pos_groups=4,
        relative_position_embedding=False, gru_rel_pos=False,
    )
    enc = EncoderConfig(**{**tiny, "conv_layers": ((32, 10, 5), (32, 3, 2))})
    model = WavLM(WavLMModelConfig(encoder=enc))
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng}, jnp.zeros((1, 4000)))
    bb = tmp_path / "bb.npz"
    save_params_npz(str(bb), variables["params"])

    rngnp = np.random.default_rng(0)
    for i in range(3):
        pcm = np.clip(
            rngnp.standard_normal(4000) * 0.1 * 32767, -32768, 32767
        ).astype(np.int16)
        with wave.open(str(tmp_path / f"s{i}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(pcm.tobytes())
    trials = tmp_path / "trials.txt"
    trials.write_text(
        "1 s0.wav s0.wav\n0 s0.wav s1.wav\n1 s1.wav s1.wav\n0 s1.wav s2.wav\n"
    )

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ver_main([
            "--trials", str(trials),
            "--wav-root", str(tmp_path),
            "--backbone", str(bb),
            "--encoder-json", jsonlib.dumps(tiny),
            "--scores-path", str(tmp_path / "scores.txt"),
        ])
    report = jsonlib.loads(buf.getvalue().strip())
    assert report["trials"] == 4
    assert 0.0 <= report["eer"] <= 100.0
    # same-utterance trials score 1.0
    lines = (tmp_path / "scores.txt").read_text().splitlines()
    assert float(lines[0].split()[0]) > 0.999
