"""Text encoder family: byte/char/subword-nmt BPE roundtrips + post_process
modes + binarize-text --encoder CLI (reference
src/fairseq/data/encoders/{bytes,characters,byte_utils}.py and
data_utils.post_process)."""

import numpy as np
import pytest

from unispeech_tpu.data.text_encoders import (
    ByteEncoder,
    CharEncoder,
    SubwordNMTBPE,
    byte_decode,
    byte_encode,
    get_text_encoder,
    smart_byte_decode,
)
from unispeech_tpu.decode.wer import post_process


def test_byte_roundtrip_ascii_and_unicode():
    enc = ByteEncoder()
    for s in ["hello world", "ümlaut façade", "日本語 テスト", "mixed 平仮名 x"]:
        toks = enc.encode(s)
        # one token per UTF-8 byte, space-separated
        assert all(len(t) == 1 for t in toks.split())
        assert enc.decode(toks) == s


def test_byte_encode_collapses_whitespace():
    assert ByteEncoder().decode(ByteEncoder().encode("a\t b\n c")) == "a b c"


def test_smart_byte_decode_recovers_truncation():
    # chop a 3-byte char in half: strict decode fails, smart decode keeps
    # the valid prefix (reference byte_utils.smart_byte_decode DP)
    full = byte_encode("ab日")
    broken = full[:-1]
    assert byte_decode(broken) == ""
    assert smart_byte_decode(broken) == "ab"


def test_char_roundtrip():
    enc = CharEncoder()
    s = "char level test"
    toks = enc.encode(s)
    assert toks.split()[4] == "▁"  # escaped space is its own token
    assert enc.decode(toks) == s
    # post_process("char") is the same inverse
    assert post_process(toks, "char") == s


def test_subword_nmt_bpe_apply_and_postprocess(tmp_path):
    # codes learned (by hand) for a toy corpus: merges in priority order
    codes = tmp_path / "codes.bpe"
    codes.write_text(
        "#version: 0.2\n"
        "l o\n"
        "lo w</w>\n"
        "e r</w>\n"
        "lo w\n"
    )
    bpe = SubwordNMTBPE(str(codes))
    # "low" -> l+o merge then lo+w</w> merge -> single token
    assert bpe.encode("low") == "low"
    # "lower": l+o, then e+r</w> (rank 2 beats rank 3), then word-internal
    # lo+w -> pieces [low, er</w>] -> continuation marker on the first
    assert bpe.encode("lower") == "low@@ er"
    out = bpe.encode("low lower")
    assert post_process(out, "bpe") == bpe.decode(out)
    assert bpe.decode(out) == "low lower"


def test_post_process_new_modes():
    assert post_process("a <SIL> b  <SIL>", "silence") == "a b"
    assert post_process("h i_EOW y o u_EOW", "_EOW") == "hi you"
    b = ByteEncoder()
    assert post_process(b.encode("héllo"), "byte") == "héllo"


def test_get_text_encoder_factory_errors():
    assert get_text_encoder("none") is None
    with pytest.raises(ValueError):
        get_text_encoder("bpe")  # needs codes
    with pytest.raises(ValueError):
        get_text_encoder("nope")


def test_binarize_text_with_char_encoder(tmp_path):
    """CLI: binarize with --encoder char, read back, decode to original."""
    from unispeech_tpu.data.__main__ import main as data_main
    from unispeech_tpu.data.dictionary import Dictionary
    from unispeech_tpu.data.indexed_dataset import MMapIndexedDataset

    corpus = tmp_path / "corpus.txt"
    lines = ["the cat", "a dog ran"]
    corpus.write_text("\n".join(lines) + "\n")
    # dictionary over the char-encoded symbol set
    enc = CharEncoder()
    syms = sorted({t for l in lines for t in enc.encode(l).split()})
    dict_path = tmp_path / "dict.txt"
    dict_path.write_text("".join(f"{s} 1\n" for s in syms))
    out = tmp_path / "train"
    data_main([
        "binarize-text", "--corpus", str(corpus), "--dict", str(dict_path),
        "--out", str(out), "--encoder", "char",
    ])
    d = Dictionary.load(str(dict_path))
    ds = MMapIndexedDataset(str(out))
    assert len(ds) == len(lines)
    for i, line in enumerate(lines):
        ids = np.asarray(ds[i])
        toks = " ".join(d[int(t)] for t in ids if int(t) != d.eos())
        assert enc.decode(toks) == line
