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

    from unispeech_tpu.decode.lm_fusion import NeuralLMScorer
    from unispeech_tpu.models.lm import TransformerLMConfig
    from unispeech_tpu.train.checkpoint import load_params_npz

    cfg = TransformerLMConfig(**json.load(open(ckpt / "lm_config.json")))
    sc = NeuralLMScorer(load_params_npz(str(npz)), cfg, d, window=16)
    st = sc.start()
    st2, s = sc.score(st, "the")
    assert np.isfinite(s) and s < 0.0
    assert st2[-1] == d.index("the")
    assert np.isfinite(sc.finish(st2))
