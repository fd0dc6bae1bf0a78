"""Data-prep CLI (`python -m unispeech_tpu.data`): manifest walker,
LibriSpeech label extraction, resampling — parity with the reference
example scripts (wav2vec_manifest.py, libri_labels.py,
adjust_sample_rate.py, unispeech_manifest.py)."""

import wave

import numpy as np

from unispeech_tpu.data.__main__ import main as data_main
from unispeech_tpu.data.manifest import Manifest, load_audio


def _write_wav(path, samples, rate=16000):
    pcm = np.clip(samples * 32767, -32768, 32767).astype(np.int16)
    path.parent.mkdir(parents=True, exist_ok=True)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())


def test_manifest_and_libri_labels(tmp_path):
    rng = np.random.default_rng(0)
    corpus = tmp_path / "corpus"
    # LibriSpeech layout: <spk>/<chap>/<spk>-<chap>-<utt>.wav + trans file
    trans = []
    for u in range(3):
        _write_wav(corpus / "19" / "198" / f"19-198-{u:04d}.wav",
                   rng.standard_normal(4000 + 100 * u) * 0.1)
        trans.append(f"19-198-{u:04d} HELLO WORLD {u}")
    (corpus / "19" / "198" / "19-198.trans.txt").write_text(
        "\n".join(trans) + "\n")

    data_main([
        "manifest", str(corpus), "--ext", "wav", "--dest", str(tmp_path),
        "--valid-percent", "0",
    ])
    man = Manifest.load(str(tmp_path / "train.tsv"))
    assert len(man) == 3
    assert man.sizes.tolist() == [4000, 4100, 4200]
    # valid.tsv exists with just the root line
    assert (tmp_path / "valid.tsv").read_text().count("\n") == 1

    data_main([
        "libri-labels", str(tmp_path / "train.tsv"),
        "--output-dir", str(tmp_path), "--output-name", "train",
    ])
    wrd = (tmp_path / "train.wrd").read_text().splitlines()
    ltr = (tmp_path / "train.ltr").read_text().splitlines()
    assert wrd[0] == "HELLO WORLD 0"
    assert ltr[0] == "H E L L O | W O R L D | 0 |"
    assert len(wrd) == len(ltr) == 3


def test_resample(tmp_path):
    rng = np.random.default_rng(1)
    src = tmp_path / "src"
    # a 1 kHz tone at 8 kHz must stay a 1 kHz tone at 16 kHz
    t8 = np.arange(8000) / 8000.0
    _write_wav(src / "a.wav", 0.5 * np.sin(2 * np.pi * 1000 * t8), rate=8000)
    (tmp_path / "list.txt").write_text("a.wav\n")
    data_main([
        "resample", "--wav-path", str(src), "--dest-path", str(tmp_path / "out"),
        "--input", str(tmp_path / "list.txt"),
        "--output", str(tmp_path / "resampled.tsv"),
    ])
    man = Manifest.load(str(tmp_path / "resampled.tsv"))
    assert len(man) == 1 and man.sizes[0] == 16000
    y = load_audio(man.abspath(0), 16_000)
    t16 = np.arange(16000) / 16000.0
    ref = 0.5 * np.sin(2 * np.pi * 1000 * t16)
    # compare away from the edges (polyphase edge effects)
    assert np.corrcoef(y[2000:14000], ref[2000:14000])[0, 1] > 0.99


def test_cv_manifest(tmp_path):
    (tmp_path / "dev.tsv").write_text(
        "client_id\tpath\tsentence\nabc\tclip1.mp3\thello there\n"
        "def\tclip2.mp3\tbye now\n")
    data_main(["cv-manifest", str(tmp_path / "dev.tsv"),
               "--dest", str(tmp_path)])
    assert (tmp_path / "dev.list").read_text().splitlines() == [
        "clip1.mp3", "clip2.mp3"
    ]
    assert (tmp_path / "dev.text").read_text().splitlines()[0] == (
        "clip1.mp3\thello there"
    )


def test_binarize_text_and_mmap_roundtrip(tmp_path):
    """binarize-text -> MMapIndexedDataset: per-sentence views and the flat
    stream match the in-RAM tokenizer (reference MMapIndexedDataset +
    Binarizer capability, indexed_dataset.py:214-470)."""
    from unispeech_tpu.data.dictionary import Dictionary
    from unispeech_tpu.data.indexed_dataset import MMapIndexedDataset
    from unispeech_tpu.data.lm_dataset import tokenize_corpus

    words = ["the", "cat", "sat", "dog", "ran"]
    corpus = tmp_path / "c.txt"
    corpus.write_text("the cat sat\ndog ran\nthe dog sat\n" + "the cat sat dog ran\n" * 40)
    d = Dictionary()
    for w in words:
        d.add_symbol(w)
    dict_path = tmp_path / "dict.txt"
    d.save(str(dict_path))

    data_main([
        "binarize-text", "--corpus", str(corpus), "--dict", str(dict_path),
        "--out", str(tmp_path / "c"),
    ])
    ds = MMapIndexedDataset(str(tmp_path / "c"))
    assert len(ds) == 43
    assert ds.sizes.tolist()[:3] == [4, 3, 4]  # eos appended per line
    ref = tokenize_corpus(str(corpus), d)
    np.testing.assert_array_equal(np.asarray(ds.flat), ref)
    np.testing.assert_array_equal(np.asarray(ds[1]), ref[4:7])

    # the LM CLI consumes the stem / .bin directly
    from unispeech_tpu.train.__main__ import main as train_main

    train_main([
        "train-lm", "--corpus", str(tmp_path / "c.bin"),
        "--dict", str(dict_path),
        "--block-size", "8", "--batch-size", "8", "--embed-dim", "16",
        "--ffn-dim", "32", "--layers", "1", "--heads", "2",
        "--max-updates", "2", "--warmup-steps", "1", "--lr", "1e-3",
        "--log-interval", "2", "--save-interval-updates", "2",
        "--checkpoint-dir", str(tmp_path / "ck"),
    ])
