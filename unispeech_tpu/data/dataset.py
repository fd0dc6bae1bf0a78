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
    def _plan(self, epoch: int) -> List[np.ndarray]:
        order = ordered_indices(
            self._sizes[self._keep], self.seed, epoch, shuffle=self.cfg.shuffle
        )
        idx = self._keep[order]
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
        crops: List[np.ndarray] = []
        starts: List[int] = []
        for i in idx:
            wav = load_audio(self.manifest.abspath(int(i)), cfg.sample_rate)
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
        return batch


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

    def _collate(self, idx, epoch, bi):
        batch = super()._collate(idx, epoch, bi)
        labs = [self.enc[int(i)] for i in idx]
        S = max(max(len(l) for l in labs), 1)
        S = int(np.ceil(S / 8) * 8)  # pad label length to x8 for bucketing
        B = len(labs)
        labels = np.full((B, S), self.dictionary.pad(), dtype=np.int32)
        for r, l in enumerate(labs):
            labels[r, : len(l)] = l
        batch["labels"] = labels
        batch["label_lengths"] = np.asarray([len(l) for l in labs], dtype=np.int32)
        return batch
