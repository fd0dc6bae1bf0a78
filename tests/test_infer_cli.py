"""End-to-end smoke test for the offline infer CLI
(`python -m unispeech_tpu.decode`), mirroring the reference eval driver
/root/reference/src/examples/speech_recognition/infer.py:261-340."""

import json
import wave

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unispeech_tpu.configs import EncoderConfig, MaskConfig
from unispeech_tpu.data.dictionary import Dictionary
from unispeech_tpu.models.ctc import CtcFinetuneConfig, CtcFinetuneModel
from unispeech_tpu.train.checkpoint import save_params_npz


TINY = dict(
    encoder_layers=2,
    encoder_embed_dim=64,
    encoder_ffn_embed_dim=128,
    encoder_attention_heads=4,
    conv_layers=[[32, 10, 5], [32, 3, 2]],
    conv_pos=16,
    conv_pos_groups=4,
    relative_position_embedding=True,
    num_buckets=32,
    max_distance=64,
    gru_rel_pos=True,
)


def _write_wav(path, samples, rate=16000):
    pcm = np.clip(samples * 32767, -32768, 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("infer")
    d = Dictionary.letters()
    enc = EncoderConfig(
        **{**TINY, "conv_layers": tuple(tuple(c) for c in TINY["conv_layers"])}
    )
    cfg = CtcFinetuneConfig(
        encoder=enc, vocab_size=len(d), apply_mask=False,
        time_mask=MaskConfig(mask_prob=0.0),
    )
    model = CtcFinetuneModel(cfg)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng}, jnp.zeros((1, 4000)), deterministic=True)
    ckpt = tmp / "model.npz"
    save_params_npz(str(ckpt), variables["params"])

    rngnp = np.random.default_rng(0)
    rows = []
    for i, n in enumerate([4000, 5200, 6400]):
        _write_wav(tmp / f"u{i}.wav", rngnp.standard_normal(n) * 0.1)
        rows.append(f"u{i}.wav\t{n}")
    (tmp / "eval.tsv").write_text(f"{tmp}\n" + "\n".join(rows) + "\n")
    (tmp / "eval.ltr").write_text("A |\nB A |\nA B |\n")
    return tmp, str(ckpt)


def _run(argv):
    from unispeech_tpu.decode.__main__ import main

    import io
    import contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(argv)
    return json.loads(buf.getvalue().strip().splitlines()[-1])


def test_viterbi_wer_report(tiny_ckpt, tmp_path):
    tmp, ckpt = tiny_ckpt
    report = _run([
        "--manifest", str(tmp / "eval.tsv"),
        "--checkpoint", ckpt,
        "--transcripts", str(tmp / "eval.ltr"),
        "--encoder-json", json.dumps(TINY),
        "--results-path", str(tmp_path),
        "--max-tokens", "20000",
    ])
    assert report["utterances"] == 3
    assert "wer" in report and "uer" in report
    assert 0.0 <= report["wer"]
    hypos = (tmp_path / "hypo.word").read_text().splitlines()
    refs = (tmp_path / "ref.word").read_text().splitlines()
    assert len(hypos) == 3 and len(refs) == 3
    # every line carries its manifest row id for alignment
    assert all("(" in h and h.rstrip()[-1] == ")" for h in hypos)


def test_beam_decoder_with_lexicon(tiny_ckpt, tmp_path):
    tmp, ckpt = tiny_ckpt
    lex = tmp_path / "lexicon.txt"
    lex.write_text("a A |\nb B |\nab A B |\n")
    report = _run([
        "--manifest", str(tmp / "eval.tsv"),
        "--checkpoint", ckpt,
        "--transcripts", str(tmp / "eval.ltr"),
        "--encoder-json", json.dumps(TINY),
        "--decoder", "beam",
        "--beam", "8",
        "--lexicon", str(lex),
    ])
    assert report["utterances"] == 3
    assert "wer" in report


def test_hypo_only_no_transcripts(tiny_ckpt):
    tmp, ckpt = tiny_ckpt
    report = _run([
        "--manifest", str(tmp / "eval.tsv"),
        "--checkpoint", ckpt,
        "--encoder-json", json.dumps(TINY),
    ])
    assert report["utterances"] == 3
    assert "wer" not in report


def test_ensemble_decoding(tiny_ckpt, tmp_path):
    """N-checkpoint ensemble (reference infer.py:281 load_model_ensemble):
    averaging a model with ITSELF must reproduce the single-model decode
    exactly (logsumexp of identical log-probs - log 2 is the identity), and
    a genuinely different second model must also decode cleanly."""
    tmp, ckpt = tiny_ckpt
    base = _run([
        "--manifest", str(tmp / "eval.tsv"),
        "--checkpoint", ckpt,
        "--transcripts", str(tmp / "eval.ltr"),
        "--encoder-json", json.dumps(TINY),
        "--results-path", str(tmp_path / "single"),
    ])
    dup = _run([
        "--manifest", str(tmp / "eval.tsv"),
        "--checkpoint", ckpt, ckpt,
        "--transcripts", str(tmp / "eval.ltr"),
        "--encoder-json", json.dumps(TINY),
        "--results-path", str(tmp_path / "dup"),
    ])
    assert dup["wer"] == base["wer"] and dup["uer"] == base["uer"]
    assert (tmp_path / "single" / "hypo.units").read_text() == (
        tmp_path / "dup" / "hypo.units"
    ).read_text()

    # different second model: just assert the ensemble path runs end-to-end
    d = Dictionary.letters()
    enc = EncoderConfig(
        **{**TINY, "conv_layers": tuple(tuple(c) for c in TINY["conv_layers"])}
    )
    cfg = CtcFinetuneConfig(
        encoder=enc, vocab_size=len(d), apply_mask=False,
        time_mask=MaskConfig(mask_prob=0.0),
    )
    model = CtcFinetuneModel(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(7)}, jnp.zeros((1, 4000)),
        deterministic=True,
    )
    ckpt2 = tmp_path / "model2.npz"
    save_params_npz(str(ckpt2), variables["params"])
    mixed = _run([
        "--manifest", str(tmp / "eval.tsv"),
        "--checkpoint", ckpt, str(ckpt2),
        "--transcripts", str(tmp / "eval.ltr"),
        "--encoder-json", json.dumps(TINY),
    ])
    assert mixed["utterances"] == 3 and "wer" in mixed
