"""Language-modeling data: token-block batching over tokenized text.

Reference capability: the `language_modeling` task
(/root/reference/src/fairseq/tasks/language_modeling.py) over
`TokenBlockDataset` (/root/reference/src/fairseq/data/token_block_dataset.py,
Cython slicing in token_block_utils_fast.pyx) and mmap'd binarized corpora.

TPU reformulation: the corpus is tokenized host-side into one flat int32
numpy array with </s> between lines ("eos" break mode is block slicing over
that array — numpy views, no Cython needed at this scale), and batches are
FIXED-SHAPE (B, block+1) windows so the jitted LM step never recompiles.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, Optional

import numpy as np

from unispeech_tpu.data.dictionary import Dictionary


def tokenize_corpus(path: str, dictionary: Dictionary) -> np.ndarray:
    """Whitespace-tokenized text file -> flat id array with eos between
    lines (reference binarizer semantics, append_eos=True)."""
    ids: List[int] = []
    eos = dictionary.eos()
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            ids.extend(dictionary.index(tok) for tok in line.split())
            ids.append(eos)
    return np.asarray(ids, np.int32)


@dataclasses.dataclass
class TokenBlockDataset:
    """Contiguous block slicing ("none" break mode,
    token_block_utils_fast.pyx:_get_slice_indices_fast)."""

    tokens: np.ndarray  # flat (N,)
    block_size: int

    def __len__(self) -> int:
        # each sample needs block_size inputs + 1 shifted target
        return max((len(self.tokens) - 1) // self.block_size, 0)

    def __getitem__(self, i: int) -> np.ndarray:
        s = i * self.block_size
        return self.tokens[s : s + self.block_size + 1]  # (block+1,)


class LMIterator:
    """Epoch-checkpointable fixed-shape batch iterator.

    Yields dict(tokens=(B, block) inputs, targets=(B, block) next tokens).
    Short tail blocks are padded with padding_idx (loss-masked).
    """

    def __init__(
        self,
        dataset: TokenBlockDataset,
        batch_size: int,
        padding_idx: int,
        seed: int = 1,
        epoch: int = 0,
        batch_offset: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.padding_idx = padding_idx
        self.seed = seed
        self.epoch = epoch
        self.batch_offset = batch_offset

    def state_dict(self):
        return {"epoch": self.epoch, "batch_offset": self.batch_offset}

    def load_state_dict(self, state):
        self.epoch = int(state["epoch"])
        self.batch_offset = int(state["batch_offset"])

    def __iter__(self) -> Iterator[dict]:
        n = len(self.dataset)
        block = self.dataset.block_size
        if n // self.batch_size == 0:
            raise ValueError(
                f"corpus too small: {n} blocks of {block} tokens cannot fill "
                f"one batch of {self.batch_size} (the iterator would spin "
                "forever); reduce --batch-size/--block-size or add data"
            )
        while True:
            order = np.random.default_rng(
                np.random.SeedSequence([self.seed, self.epoch])
            ).permutation(n)
            n_batches = n // self.batch_size
            for bi in range(self.batch_offset, n_batches):
                idx = order[bi * self.batch_size : (bi + 1) * self.batch_size]
                buf = np.full(
                    (self.batch_size, block + 1), self.padding_idx, np.int32
                )
                for r, i in enumerate(idx):
                    chunk = self.dataset[int(i)]
                    buf[r, : len(chunk)] = chunk
                self.batch_offset = bi + 1
                yield {"tokens": buf[:, :-1], "targets": buf[:, 1:]}
            self.epoch += 1
            self.batch_offset = 0
