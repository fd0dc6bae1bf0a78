"""Memory-mapped binarized token datasets.

Reference capability: fairseq's MMapIndexedDataset + binarizer
(/root/reference/src/fairseq/data/indexed_dataset.py:214-470,
binarizer.py) — tokenized corpora stored as a raw token stream plus an
index so LM training scales past in-RAM text files.

Format (self-describing, numpy-native instead of the reference's struct
headers): `<stem>.bin` is the flat little-endian token stream and
`<stem>.idx.npz` holds {dtype, sizes} where sizes[i] is sentence i's token
count (eos included when the binarizer appends it). The flat stream mmaps
straight into TokenBlockDataset for LM block slicing; per-sentence access
uses the prefix-sum offsets.
"""

from __future__ import annotations

import os
from typing import Iterable, Optional

import numpy as np

from unispeech_tpu.data.dictionary import Dictionary


class MMapIndexedDataset:
    """Read side: zero-copy views into the mmap'd token stream."""

    def __init__(self, stem: str):
        idx = np.load(stem + ".idx.npz")
        self.sizes = idx["sizes"].astype(np.int64)
        dtype = np.dtype(str(idx["dtype"]))
        self.tokens = np.memmap(stem + ".bin", dtype=dtype, mode="r")
        self.offsets = np.concatenate(
            [[0], np.cumsum(self.sizes)]
        )
        assert self.offsets[-1] == len(self.tokens), (
            f"index/bin mismatch: {self.offsets[-1]} vs {len(self.tokens)}"
        )

    def __len__(self) -> int:
        return len(self.sizes)

    def __getitem__(self, i: int) -> np.ndarray:
        return self.tokens[self.offsets[i] : self.offsets[i + 1]]

    @property
    def flat(self) -> np.ndarray:
        """The whole stream as one mmap'd array (token-block LM input)."""
        return self.tokens


def binarize_text(
    corpus: str,
    dictionary: Dictionary,
    stem: str,
    append_eos: bool = True,
    add_if_not_exist: bool = False,
) -> int:
    """Tokenize a text file line-by-line into <stem>.bin/.idx.npz
    (reference Binarizer.binarize semantics: whitespace tokens via
    Dictionary.encode_line, eos after each line). Streams — the corpus is
    never held in RAM. Returns the sentence count."""
    os.makedirs(os.path.dirname(os.path.abspath(stem)), exist_ok=True)
    sizes = []
    with open(stem + ".bin", "wb") as out, open(
        corpus, encoding="utf-8"
    ) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            ids = dictionary.encode_line(
                line, append_eos=append_eos,
                add_if_not_exist=add_if_not_exist,
            ).astype(np.int32)
            out.write(ids.astype("<i4").tobytes())
            sizes.append(len(ids))
    np.savez(
        stem + ".idx", dtype=np.str_("int32"),
        sizes=np.asarray(sizes, np.int32),
    )
    return len(sizes)
