"""Edit distance + WER/UER scoring.

Replaces the reference's editdistance dependency and the C++ batch kernel
(/root/reference/src/fairseq/clib/libnat/edit_dist.cpp) with a vectorized
numpy Levenshtein (anti-diagonal-free row DP — fast enough for eval batches;
a C++ ctypes kernel in native/ is used when built). Also ports `post_process`
(/root/reference/src/fairseq/data/data_utils.py:369-391): letter/bpe detok.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def edit_distance(a: Sequence, b: Sequence) -> int:
    """Levenshtein distance: C++ kernel when built, numpy row DP fallback."""
    if len(a) == 0:
        return len(b)
    if len(b) == 0:
        return len(a)
    from unispeech_tpu.native import edit_distance_native

    # map arbitrary hashables to int32 ids for the native kernel
    vocab = {}
    ai = [vocab.setdefault(x, len(vocab)) for x in a]
    bi = [vocab.setdefault(x, len(vocab)) for x in b]
    d = edit_distance_native(ai, bi)
    if d is not None:
        return d
    n = len(b)
    bb = np.asarray([hash(x) for x in b])
    j_idx = np.arange(n + 1)
    prev = j_idx.copy()
    for i, x in enumerate(a, 1):
        # t[j] = min(prev[j] + 1 [deletion], prev[j-1] + cost [substitution]);
        # insertions give cur[j] = min_{k<=j} t[k] + (j - k), resolved with a
        # running-minimum scan (t[0] = i is the row boundary).
        t = np.empty(n + 1, dtype=np.int64)
        t[0] = i
        np.minimum(prev[1:] + 1, prev[:-1] + (bb != hash(x)), out=t[1:])
        prev = np.minimum.accumulate(t - j_idx) + j_idx
    return int(prev[-1])


def post_process(sentence: str, symbol: str) -> str:
    """Detokenize (reference data_utils.post_process, data_utils.py:369-392).

    byte/char route through the matching text encoders
    (data/text_encoders.py), mirroring how the reference inverts its
    encoders/bytes.py and encoders/characters.py output."""
    if symbol == "sentencepiece":
        return sentence.replace(" ", "").replace("▁", " ").strip()
    if symbol == "wordpiece":
        return sentence.replace(" ", "").replace("_", " ").strip()
    if symbol == "letter":
        return sentence.replace(" ", "").replace("|", " ").strip()
    if symbol == "silence":
        import re

        return re.sub(" +", " ", sentence.replace("<SIL>", "")).strip()
    if symbol == "_EOW":
        return sentence.replace(" ", "").replace("_EOW", " ").strip()
    if symbol in ("subword_nmt", "bpe", "@@ ", "@@"):
        return (sentence + " ").replace("@@ ", "").rstrip()
    if symbol == "byte":
        from unispeech_tpu.data.text_encoders import ByteEncoder

        return ByteEncoder().decode(sentence)
    if symbol in ("char", "characters"):
        from unispeech_tpu.data.text_encoders import CharEncoder

        return CharEncoder().decode(sentence)
    if symbol == "none" or symbol is None:
        return sentence
    raise ValueError(f"unknown post_process symbol: {symbol}")


class WerScorer:
    """Accumulating WER/UER meter, mirroring the CTC criterion's dev scoring
    (/root/reference/src/fairseq/criterions/ctc.py:161-233)."""

    def __init__(self):
        self.w_errs = 0
        self.w_len = 0
        self.c_errs = 0
        self.c_len = 0

    def add(self, hyp: str, ref: str) -> None:
        hyp_words, ref_words = hyp.split(), ref.split()
        self.w_errs += edit_distance(hyp_words, ref_words)
        self.w_len += len(ref_words)
        hyp_units, ref_units = list(hyp), list(ref)
        self.c_errs += edit_distance(hyp_units, ref_units)
        self.c_len += len(ref_units)

    @property
    def wer(self) -> float:
        return 100.0 * self.w_errs / max(self.w_len, 1)

    @property
    def uer(self) -> float:
        return 100.0 * self.c_errs / max(self.c_len, 1)
