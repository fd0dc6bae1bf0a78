"""Epoch-checkpointable batch iterators over audio manifests.

Replaces the reference's FairseqDataset + EpochBatchIterator machinery
(/root/reference/src/fairseq/data/audio/raw_audio_dataset.py,
hubert_dataset.py, iterators.py:225) with two plain iterator classes that
produce **fixed-bucket-shape** numpy batches (XLA-friendly) deterministically
from (seed, epoch, batch_offset) — the tuple is the whole resumable state,
replacing the reference's pickled iterator checkpoints.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from unispeech_tpu.data.batching import (
    batch_by_size,
    bucket_for,
    length_buckets,
    ordered_indices,
    shard_batches,
)
from unispeech_tpu.data.dictionary import Dictionary
from unispeech_tpu.data.labels import LabelFile, align_labels_to_frames, crop_labels
from unispeech_tpu.data.manifest import Manifest, load_audio
from unispeech_tpu.data.mixing import MixingConfig, NoiseStore, mix_batch_host
from unispeech_tpu.data.prefetch import parallel_map_io, prefetch


@dataclass
class DataConfig:
    """Dataset/task-side knobs (reference audio_pretraining /
    hubert_pretraining task configs)."""

    max_sample_size: int = 250_000  # crop bound (~15.6 s)
    min_sample_size: int = 32_000
    max_tokens: int = 1_400_000  # token budget per batch (samples)
    max_sentences: int = 0
    sample_rate: int = 16_000
    label_rate: float = 50.0
    normalize: bool = False  # host-side per-utterance normalize
    num_buckets: int = 8
    random_crop: bool = True
    shuffle: bool = True
    required_batch_size_multiple: int = 8
    # host input-pipeline parallelism (reference DataLoader workers)
    num_workers: int = 8  # intra-batch audio-read thread pool
    prefetch_depth: int = 4  # batches prepared ahead of the train loop
    # fully static shapes: every batch of bucket length Tb has exactly
    # fixed_bsz(Tb) rows (short final batches zero-row padded, lengths=0), so
    # the train step compiles at most num_buckets programs. The reference's
    # TPU path approximated this with set_bucket_info + precomputed masks
    # (raw_audio_dataset.py:297); XLA demands it outright.
    fixed_shapes: bool = True


class PretrainIterator:
    """Audio (+ optional frame labels) batches for pretraining.

    Yields dicts: source (B, Tb) f32, lengths (B,) i32, and when labels are
    given targets (B, Tf, num_sets) i32 (pad -1). Tb is one of a fixed set of
    bucket lengths; Tf the matching frame count.
    """

    def __init__(
        self,
        manifest: Manifest,
        cfg: DataConfig,
        label_files: Sequence[LabelFile] = (),
        frame_hop: int = 320,
        frames_fn=None,  # num_samples -> num_frames (EncoderConfig.num_frames)
        mixing: Optional[MixingConfig] = None,
        noise: Optional[NoiseStore] = None,
        seed: int = 1,
        num_shards: int = 1,
        shard_id: int = 0,
        lang_groups: Optional[Sequence[np.ndarray]] = None,
        multilang_alpha: float = 1.0,
    ):
        self.manifest = manifest
        self.cfg = cfg
        self.labels = list(label_files)
        self.frame_hop = frame_hop
        self.frames_fn = frames_fn or (lambda n: max((n - 400) // frame_hop + 1, 0))
        self.mixing = mixing
        self.noise = noise
        self.seed = seed
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.epoch = 1
        self.batch_offset = 0
        sizes = np.minimum(manifest.sizes, cfg.max_sample_size)
        self._keep = np.flatnonzero(manifest.sizes >= cfg.min_sample_size)
        self._sizes = sizes
        # multilingual temperature resampling (audio_pretraining.py:211-219):
        # per-epoch per-language row multisets drawn in _epoch_rows
        self._lang_groups = None
        self._lang_ratios = None
        if lang_groups is not None:
            from unispeech_tpu.data.multilingual import multilang_size_ratios

            keep_set = set(self._keep.tolist())
            self._lang_groups = [
                np.asarray([r for r in g if r in keep_set], dtype=np.int64)
                for g in lang_groups
            ]
            lengths = np.asarray([max(len(g), 1) for g in self._lang_groups])
            self._lang_ratios = multilang_size_ratios(lengths, multilang_alpha)
        # zip-sharded manifests: preserve archive locality when shuffling
        # (reference chunk shuffle, utterance_mixing_dataset.py:519-547)
        self._chunk_ids = manifest.chunk_ids()
        self._buckets = length_buckets(
            int(sizes[self._keep].max()) if len(self._keep) else cfg.max_sample_size,
            min_size=min(cfg.min_sample_size, int(sizes[self._keep].min()) if len(self._keep) else cfg.min_sample_size),
            num_buckets=cfg.num_buckets,
            multiple=frame_hop,
        )

    # -- resumable state -------------------------------------------------
    def state_dict(self) -> Dict:
        return {"epoch": self.epoch, "batch_offset": self.batch_offset}

    def load_state_dict(self, d: Dict) -> None:
        self.epoch = d["epoch"]
        self.batch_offset = d["batch_offset"]

    # -- epoch plan --------------------------------------------------------
    def _epoch_rows(self, epoch: int) -> np.ndarray:
        """Row pool for one epoch: all kept rows, or the per-language
        temperature-resampled multiset."""
        if self._lang_groups is None:
            return self._keep
        from unispeech_tpu.data.multilingual import resampled_rows

        parts = [
            resampled_rows(g, float(r), self.seed, epoch, li)
            for li, (g, r) in enumerate(zip(self._lang_groups, self._lang_ratios))
        ]
        return np.concatenate(parts) if parts else self._keep

    def fixed_bsz(self, bucket_len: int) -> int:
        """Rows per batch at bucket length Tb — a pure function of the
        bucket, so (B, Tb) is static per bucket."""
        cfg = self.cfg
        nb = max(int(cfg.max_tokens // bucket_len), 1) if cfg.max_tokens else 1
        m = cfg.required_batch_size_multiple
        if m > 1 and nb >= m:
            nb = nb // m * m
        if cfg.max_sentences:
            nb = min(nb, cfg.max_sentences)
        return max(nb, 1)

    def _plan(self, epoch: int) -> List[np.ndarray]:
        pool = self._epoch_rows(epoch)
        if self._chunk_ids is not None and self.cfg.shuffle:
            from unispeech_tpu.data.batching import chunk_shuffled_indices

            idx = pool[chunk_shuffled_indices(
                self._sizes[pool], self._chunk_ids[pool], self.seed, epoch,
                self.cfg.max_sample_size,
            )]
        else:
            order = ordered_indices(
                self._sizes[pool], self.seed, epoch, shuffle=self.cfg.shuffle
            )
            idx = pool[order]
        if self.cfg.fixed_shapes:
            # exact-size batches per bucket; idx is length-sorted so rows
            # arrive bucket-by-bucket and stay grouped
            bl = bucket_for(self._sizes[idx], self._buckets)
            batches = []
            buf: List[int] = []
            cur = -1
            for row, b in zip(idx, bl):
                if buf and (b != cur or len(buf) == self.fixed_bsz(cur)):
                    batches.append(np.asarray(buf))
                    buf = []
                cur = int(b)
                buf.append(int(row))
            if buf:
                batches.append(np.asarray(buf))
        else:
            batches = batch_by_size(
                idx,
                self._sizes[idx],
                max_tokens=self.cfg.max_tokens,
                max_sentences=self.cfg.max_sentences,
                bsz_mult=self.cfg.required_batch_size_multiple,
            )
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch, 7919])
        )
        perm = rng.permutation(len(batches))
        batches = [batches[i] for i in perm]
        return shard_batches(batches, self.num_shards, self.shard_id)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        while True:
            plan = self._plan(self.epoch)
            for bi in range(self.batch_offset, len(plan)):
                self.batch_offset = bi + 1
                yield self._collate(plan[bi], self.epoch, bi)
            self.epoch += 1
            self.batch_offset = 0

    def epoch_batches(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        for bi, batch in enumerate(self._plan(epoch)):
            yield self._collate(batch, epoch, bi)

    # -- collation ---------------------------------------------------------
    def _collate(self, idx: np.ndarray, epoch: int, bi: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch, bi, 104729])
        )
        # file reads fan out over the IO thread pool; crop RNG draws stay in
        # row order below so the (seed, epoch, batch) stream is unchanged
        wavs = parallel_map_io(
            lambda i: load_audio(self.manifest.abspath(int(i)), cfg.sample_rate),
            list(idx),
            workers=cfg.num_workers,
        )
        crops: List[np.ndarray] = []
        starts: List[int] = []
        for wav in wavs:
            if cfg.normalize:
                wav = (wav - wav.mean()) / np.sqrt(wav.var() + 1e-5)
            n = len(wav)
            target = min(n, cfg.max_sample_size)
            start = (
                int(rng.integers(0, n - target + 1)) if (cfg.random_crop and n > target) else 0
            )
            crops.append(wav[start : start + target])
            starts.append(start)

        lengths = np.asarray([len(c) for c in crops], dtype=np.int32)
        Tb = int(bucket_for(np.asarray([lengths.max()]), self._buckets)[0])
        B = len(crops)
        source = np.zeros((B, Tb), dtype=np.float32)
        for r, c in enumerate(crops):
            source[r, : len(c)] = c

        if self.mixing is not None:
            source = mix_batch_host(
                rng, source, lengths, self.mixing, noise=self.noise
            )

        batch: Dict[str, np.ndarray] = {"source": source, "lengths": lengths}
        if self.labels:
            Tf = self.frames_fn(Tb)
            feat2tar = cfg.label_rate * self.frame_hop / cfg.sample_rate
            targets = np.full((B, Tf, len(self.labels)), -1, dtype=np.int32)
            for si, lf in enumerate(self.labels):
                for r, i in enumerate(idx):
                    lab = crop_labels(
                        lf.get(int(i)),
                        starts[r],
                        int(lengths[r]),
                        cfg.sample_rate,
                        lf.label_rate,
                    )
                    aligned, _ = align_labels_to_frames(
                        lab, Tf, feat2tar, pad_id=-1
                    )
                    targets[r, :, si] = aligned
            # frames past audio validity are already excluded by the model's
            # padding mask; -1 targets are additionally excluded via weights
            batch["targets"] = np.maximum(targets, 0)
            batch["target_valid"] = (targets >= 0).astype(np.float32)
        if self.cfg.fixed_shapes:
            batch = _pad_rows(batch, self.fixed_bsz(Tb))
        return batch


def _pad_rows(batch: Dict[str, np.ndarray], B_target: int) -> Dict[str, np.ndarray]:
    """Zero-row pad every array in the batch to B_target rows.

    Padded rows carry lengths 0 / weights 0, so losses and the mask sampler
    (which never masks past `lengths`) give them zero contribution.
    """
    B = batch["source"].shape[0]
    if B >= B_target:
        return batch
    pad = B_target - B
    out: Dict[str, np.ndarray] = {}
    for k, v in batch.items():
        out[k] = np.concatenate(
            [v, np.zeros((pad,) + v.shape[1:], dtype=v.dtype)], axis=0
        )
    return out


class FinetuneIterator(PretrainIterator):
    """Audio + transcript batches for CTC fine-tuning.

    transcripts: one text line per manifest row (letter format e.g.
    "H E L L O | W O R L D |"); encoded with `dictionary`. Mirrors
    AddTargetDataset / HubertDataset fine-tune path
    (add_target_dataset.py:11; hubert_dataset.py collater_seq_label).
    """

    def __init__(
        self,
        manifest: Manifest,
        cfg: DataConfig,
        transcripts: Sequence[str],
        dictionary: Dictionary,
        **kw,
    ):
        super().__init__(manifest, cfg, label_files=(), **kw)
        assert len(transcripts) == len(manifest)
        self.dictionary = dictionary
        self.enc = [dictionary.encode_line(t) for t in transcripts]
        # static label length: one S for the whole dataset (x8 aligned) so
        # (B, Tb, S) varies only with the audio bucket
        self._S_fixed = int(
            np.ceil(max((len(e) for e in self.enc), default=1) / 8) * 8
        ) or 8

    def _collate(self, idx, epoch, bi):
        batch = super()._collate(idx, epoch, bi)
        labs = [self.enc[int(i)] for i in idx]
        if self.cfg.fixed_shapes:
            S = self._S_fixed
        else:
            S = max(max(len(l) for l in labs), 1)
            S = int(np.ceil(S / 8) * 8)  # pad label length to x8 for bucketing
        B = batch["source"].shape[0]  # includes zero-padded rows
        labels = np.full((B, S), self.dictionary.pad(), dtype=np.int32)
        lab_len = np.zeros((B,), dtype=np.int32)
        for r, l in enumerate(labs):
            labels[r, : len(l)] = l
            lab_len[r] = len(l)
        batch["labels"] = labels
        batch["label_lengths"] = lab_len
        return batch


class Seq2SeqIterator(FinetuneIterator):
    """Audio + teacher-forced token batches for seq2seq ASR fine-tuning.

    Adds to each batch: `prev_tokens` (B, S) = eos-shifted targets (fairseq
    conditions on </s> as bos: collate's move_eos_to_beginning,
    /root/reference/src/fairseq/data/data_utils.py:38-57), `targets` (B, S)
    = tokens + eos (pad after), and `target_mask` (B, S) in {0, 1}.
    """

    def _collate(self, idx, epoch, bi):
        batch = super()._collate(idx, epoch, bi)
        labels = batch.pop("labels")
        lab_len = batch.pop("label_lengths")
        B, S = labels.shape
        S2 = int(np.ceil((S + 1) / 8) * 8)
        eos = self.dictionary.eos()
        pad = self.dictionary.pad()
        tgt = np.full((B, S2), pad, np.int32)
        prev = np.full((B, S2), pad, np.int32)
        mask = np.zeros((B, S2), np.float32)
        for r in range(B):
            L = int(lab_len[r])
            tgt[r, :L] = labels[r, :L]
            tgt[r, L] = eos
            prev[r, 0] = eos
            prev[r, 1 : L + 1] = labels[r, :L]
            mask[r, : L + 1] = 1.0
        batch["targets"] = tgt
        batch["prev_tokens"] = prev
        batch["target_mask"] = mask
        return batch
