"""train-lm CLI end to end: corpus -> TransformerLM -> npz -> fusion scorer."""

import json

import numpy as np

from unispeech_tpu.data.dictionary import Dictionary


def test_train_lm_cli_roundtrip(tmp_path):
    words = ["the", "cat", "sat", "on", "mat", "dog", "ran"]
    corpus = tmp_path / "corpus.txt"
    with open(corpus, "w") as f:
        for i in range(120):
            f.write(" ".join(words[(i + j) % 7] for j in range(8)) + "\n")
    d = Dictionary()
    for w in words:
        d.add_symbol(w)
    dict_path = tmp_path / "dict.txt"
    d.save(str(dict_path))

    from unispeech_tpu.train.__main__ import main as train_main

    ckpt = tmp_path / "ckpt"
    npz = tmp_path / "lm.npz"
    train_main([
        "train-lm", "--corpus", str(corpus), "--dict", str(dict_path),
        "--block-size", "16", "--batch-size", "8", "--embed-dim", "32",
        "--ffn-dim", "64", "--layers", "2", "--heads", "2",
        "--max-updates", "25", "--warmup-steps", "8", "--lr", "3e-3",
        "--log-interval", "25", "--save-interval-updates", "25",
        "--checkpoint-dir", str(ckpt), "--export-params", str(npz),
    ])

    # the advertised pipeline: decode --decoder neural loads via
    # load_neural_lm(<npz>, <dict>) — train-lm must have written the config
    # next to the exported npz (round-3 advisor medium finding)
    from unispeech_tpu.decode.lm_fusion import load_neural_lm

    assert (tmp_path / "lm.json").exists()
    sc = load_neural_lm(str(npz), str(dict_path), window=16)
    st = sc.start()
    st2, s = sc.score(st, "the")
    assert np.isfinite(s) and s < 0.0
    assert st2[-1] == d.index("the")
    assert np.isfinite(sc.finish(st2))

    # fallback path: an npz without a sibling json resolves
    # <dir>/lm_config.json instead
    import shutil

    alt = tmp_path / "alt"
    alt.mkdir()
    shutil.copy(npz, alt / "model.npz")
    shutil.copy(ckpt / "lm_config.json", alt / "lm_config.json")
    sc2 = load_neural_lm(str(alt / "model.npz"), str(dict_path), window=16)
    _, s2 = sc2.score(sc2.start(), "the")
    assert np.isfinite(s2)
