"""Token-budget batch packing + static-shape bucketing.

`batch_by_size` is a faithful numpy port of the reference's Cython kernel
`batch_by_size_vec` (/root/reference/src/fairseq/data/data_utils_fast.pyx:
20-103): one linear scan over length-ordered indices, closing a batch when
the token budget (max_len * bsz) or sentence cap would overflow, with
bsz-multiple alignment. A compiled C++ version (native/packer.cpp) is used
when built — see `unispeech_tpu.native`.

On top we add what the reference lacks and XLA demands: `bucket_batches`
rounds every batch's padded length up to one of a fixed set of bucket lengths
so the jitted train step compiles a handful of shapes instead of one per
batch (the reference's TPU path solved this with `set_bucket_info`,
raw_audio_dataset.py:297).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


def _is_batch_full(num_sentences: int, num_tokens: int, max_tokens: int,
                   max_sentences: int) -> bool:
    if num_sentences == 0:
        return False
    if max_sentences > 0 and num_sentences == max_sentences:
        return True
    if max_tokens > 0 and num_tokens > max_tokens:
        return True
    return False


def batch_by_size(
    indices: np.ndarray,  # (N,) dataset indices, caller-ordered
    sizes: np.ndarray,  # (N,) num_tokens per index, aligned with `indices`
    max_tokens: int = 0,
    max_sentences: int = 0,
    bsz_mult: int = 1,
) -> List[np.ndarray]:
    """Port of batch_by_size_vec (data_utils_fast.pyx:20-103).

    Uses the C++ packer (native/packer.cpp) when built; this python scan is
    the behavior-identical fallback."""
    indices = np.asarray(indices)
    sizes = np.asarray(sizes)
    if max_tokens > 0 and len(sizes) and int(sizes.max()) > max_tokens:
        bad = indices[int(np.argmax(sizes))]
        raise AssertionError(
            f"sentence at index {bad} of size {int(sizes.max())} exceeds "
            f"max_tokens limit of {max_tokens}"
        )
    from unispeech_tpu.native import batch_by_size_native

    ends = batch_by_size_native(sizes, max_tokens, max_sentences, bsz_mult)
    if ends is not None:
        out, start = [], 0
        for e in ends:
            out.append(indices[start:e])
            start = int(e)
        return out
    batches: List[np.ndarray] = []
    start = 0
    sample_len = 0  # max size within current batch
    for i in range(len(indices)):
        sz = int(sizes[i])
        if max_tokens > 0:
            assert sz <= max_tokens, (
                f"sentence at index {indices[i]} of size {sz} exceeds "
                f"max_tokens limit of {max_tokens}"
            )
        sample_len = max(sample_len, sz)
        num_sentences = i - start
        num_tokens = (num_sentences + 1) * sample_len
        if _is_batch_full(num_sentences, num_tokens, max_tokens, max_sentences):
            # align batch size down to a bsz_mult multiple (pyx:69-77)
            mod = num_sentences % bsz_mult
            take = num_sentences - mod if num_sentences > bsz_mult else num_sentences
            take = max(take, 1)
            batches.append(indices[start : start + take])
            start = start + take
            sample_len = int(sizes[start : i + 1].max()) if start <= i else 0
    if start < len(indices):
        batches.append(indices[start:])
    return batches


def length_buckets(
    max_size: int,
    min_size: int = 16000,
    num_buckets: int = 10,
    multiple: int = 320,
) -> np.ndarray:
    """Geometric bucket boundaries, rounded to a frame-hop multiple so frame
    counts are stable across bucket members."""
    edges = np.geomspace(min_size, max_size, num_buckets)
    edges = np.unique((np.ceil(edges / multiple) * multiple).astype(np.int64))
    edges[-1] = max(edges[-1], max_size)
    return edges


def bucket_for(sizes: np.ndarray, buckets: np.ndarray) -> np.ndarray:
    """Padded length for each size: smallest bucket >= size."""
    idx = np.searchsorted(buckets, sizes, side="left")
    idx = np.minimum(idx, len(buckets) - 1)
    return buckets[idx]


def ordered_indices(
    sizes: np.ndarray,
    seed: int,
    epoch: int,
    shuffle: bool = True,
    chunk_size: Optional[int] = None,
) -> np.ndarray:
    """Length-sorted indices with random tiebreak, or chunked shuffle for
    sharded corpora (reference ordered_indices + chunk shuffle,
    utterance_mixing_dataset.py:519-561)."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, epoch]))
    n = len(sizes)
    if not shuffle:
        return np.argsort(sizes, kind="mergesort")
    noise = rng.permutation(n)
    order = np.lexsort((noise, sizes))
    if chunk_size:
        chunks = [order[i : i + chunk_size] for i in range(0, n, chunk_size)]
        rng.shuffle(chunks)
        order = np.concatenate(chunks)
    return order


def chunk_shuffled_indices(
    sizes: np.ndarray,
    chunk_ids: np.ndarray,  # (N,) shard index per row, -1 = unsharded
    seed: int,
    epoch: int,
    max_sample_size: int,
    group: int = 10,
) -> np.ndarray:
    """Shard-locality-preserving shuffle for zip-sharded corpora.

    Reference behavior (utterance_mixing_dataset.py:519-547): permute the
    shard (chunk) order per epoch, then for every run of `group` shards,
    length-sort descending (capped at max_sample_size) with a random
    tiebreak. Rows from one archive stay near each other, so reads remain
    sequential per shard, while batches still get near-uniform lengths.
    """
    rng = np.random.default_rng(np.random.SeedSequence([seed, epoch]))
    n_chunks = int(chunk_ids.max()) + 1
    chunk_rows = [np.flatnonzero(chunk_ids == c) for c in range(n_chunks)]
    loose = np.flatnonzero(chunk_ids < 0)
    if len(loose):
        chunk_rows.append(loose)
    order = rng.permutation(len(chunk_rows))
    out: List[np.ndarray] = []
    for g0 in range(0, len(order), group):
        rows = np.concatenate([chunk_rows[c] for c in order[g0 : g0 + group]])
        capped = np.minimum(sizes[rows], max_sample_size)
        noise = rng.permutation(len(rows))
        sort_idx = np.lexsort((noise, capped))[::-1]
        out.append(rows[sort_idx])
    return np.concatenate(out) if out else np.arange(0)


def shard_batches(
    batches: List[np.ndarray], num_shards: int, shard_id: int,
) -> List[np.ndarray]:
    """One batch shard per DP host (reference ShardedIterator,
    iterators.py:523); drops the tail remainder so all hosts step equally."""
    usable = (len(batches) // num_shards) * num_shards
    return batches[shard_id:usable:num_shards]
