"""Zip-sharded corpora: slice reads, chunk shuffle, streaming, feats."""

import io
import os
import struct
import wave
import zipfile

import numpy as np
import pytest

from unispeech_tpu.data.manifest import Manifest, load_audio, parse_path


def _write_wav_bytes(wav: np.ndarray, rate: int = 16000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((wav * 32767).astype(np.int16).tobytes())
    return buf.getvalue()


def _make_zip_shard(path, wavs):
    """Write a STORED zip of wav files; return [(offset, length)] of the
    raw member payloads (the reference's manifest slice format)."""
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as z:
        for i, wav in enumerate(wavs):
            z.writestr(f"utt{i}.wav", _write_wav_bytes(wav))
    slices = []
    with zipfile.ZipFile(path) as z:
        for info in z.infolist():
            with open(path, "rb") as f:
                f.seek(info.header_offset)
                hdr = f.read(30)
                n_name, n_extra = struct.unpack("<HH", hdr[26:30])
            offset = info.header_offset + 30 + n_name + n_extra
            slices.append((offset, info.file_size))
    return slices


def _rng_wavs(n, rng, lo=2000, hi=6000):
    return [
        rng.standard_normal(int(rng.integers(lo, hi))).astype(np.float32) * 0.1
        for _ in range(n)
    ]


def test_zip_slice_load_matches_direct(tmp_path):
    rng = np.random.default_rng(0)
    wavs = _rng_wavs(4, rng)
    shard = str(tmp_path / "shard0.zip")
    slices = _make_zip_shard(shard, wavs)
    for wav, (off, ln) in zip(wavs, slices):
        path = f"{shard}:{off}:{ln}"
        f, slc = parse_path(path)
        assert f == shard and slc == (off, ln)
        got = load_audio(path)
        ref = np.round(wav * 32767) / 32768.0 * (32768.0 / 32767.0)
        assert len(got) == len(wav)
        np.testing.assert_allclose(got, (wav * 32767).astype(np.int16) / 32768.0,
                                   atol=1e-6)


def test_manifest_chunk_ids_and_chunked_shuffle(tmp_path):
    from unispeech_tpu.data.batching import chunk_shuffled_indices

    rng = np.random.default_rng(1)
    shards, rows = [], []
    for s in range(4):
        wavs = _rng_wavs(6, rng)
        shard = str(tmp_path / f"s{s}.zip")
        slices = _make_zip_shard(shard, wavs)
        for (off, ln), wav in zip(slices, wavs):
            rows.append((f"s{s}.zip:{off}:{ln}", len(wav)))
    man_path = tmp_path / "train.tsv"
    with open(man_path, "w") as f:
        f.write(str(tmp_path) + "\n")
        for p, n in rows:
            f.write(f"{p}\t{n}\n")
    man = Manifest.load(str(man_path))
    cids = man.chunk_ids()
    assert cids is not None and cids.shape == (24,)
    assert [int(c) for c in np.unique(cids)] == [0, 1, 2, 3]

    order = chunk_shuffled_indices(
        man.sizes, cids, seed=3, epoch=1, max_sample_size=10_000, group=2
    )
    assert sorted(order.tolist()) == list(range(24))
    # locality: each half of the order covers exactly 2 whole shards
    first = set(cids[order[:12]].tolist())
    assert len(first) == 2
    # determinism + epoch variation
    order2 = chunk_shuffled_indices(
        man.sizes, cids, seed=3, epoch=1, max_sample_size=10_000, group=2
    )
    np.testing.assert_array_equal(order, order2)
    order3 = chunk_shuffled_indices(
        man.sizes, cids, seed=3, epoch=2, max_sample_size=10_000, group=2
    )
    assert not np.array_equal(order, order3)


def test_pretrain_iterator_over_zip_manifest(tmp_path):
    from unispeech_tpu.data.dataset import DataConfig, PretrainIterator

    rng = np.random.default_rng(2)
    rows = []
    for s in range(2):
        wavs = _rng_wavs(5, rng, lo=3000, hi=8000)
        shard = str(tmp_path / f"s{s}.zip")
        slices = _make_zip_shard(shard, wavs)
        for (off, ln), wav in zip(slices, wavs):
            rows.append((f"s{s}.zip:{off}:{ln}", len(wav)))
    man_path = tmp_path / "train.tsv"
    with open(man_path, "w") as f:
        f.write(str(tmp_path) + "\n")
        for p, n in rows:
            f.write(f"{p}\t{n}\n")
    man = Manifest.load(str(man_path))
    cfg = DataConfig(
        max_sample_size=8000, min_sample_size=1000, max_tokens=16_000,
        num_buckets=4, num_workers=0, required_batch_size_multiple=1,
    )
    it = PretrainIterator(man, cfg, seed=5)
    seen = 0
    for batch in it.epoch_batches(1):
        assert batch["source"].ndim == 2
        valid = batch["lengths"] > 0
        assert np.isfinite(batch["source"]).all()
        seen += int(valid.sum())
    assert seen == 10


def test_streaming_chunk_iterator(tmp_path):
    from unispeech_tpu.data.chunk_stream import (
        ChunkStreamConfig,
        StreamingChunkIterator,
    )

    rng = np.random.default_rng(3)
    shards = []
    total = 0
    for s in range(3):
        wavs = _rng_wavs(4, rng, lo=3000, hi=7000)
        total += len(wavs)
        shard = str(tmp_path / f"c{s}.zip")
        _make_zip_shard(shard, wavs)
        shards.append(shard)
    cfg = ChunkStreamConfig(
        max_sample_size=8000, min_sample_size=1000, max_tokens=16_000,
        buffer_utterances=5, num_buckets=4,
    )
    it = StreamingChunkIterator(shards, cfg, seed=7)
    n = 0
    gen = iter(it)
    batches = []
    while n < total:
        b = next(gen)
        assert b["source"].shape[0] == len(b["lengths"])
        assert b["source"].shape[1] in it._buckets
        n += len(b["lengths"])
        batches.append(b)
    assert n == total
    # resume state advances at shard granularity
    st = it.state_dict()
    assert st["epoch"] >= 1
    it2 = StreamingChunkIterator(shards, cfg, seed=7)
    it2.load_state_dict(st)
    assert it2.epoch == st["epoch"]


def test_feats_iterator(tmp_path):
    from unispeech_tpu.data.feats import FeatsConfig, FeatsIterator, fbank, mfcc

    rng = np.random.default_rng(4)
    paths = []
    for i in range(5):
        wav = rng.standard_normal(int(rng.integers(4000, 9000))).astype(
            np.float32
        ) * 0.1
        p = tmp_path / f"u{i}.wav"
        with open(p, "wb") as f:
            f.write(_write_wav_bytes(wav))
        paths.append((f"u{i}.wav", len(wav)))
    man_path = tmp_path / "train.tsv"
    with open(man_path, "w") as f:
        f.write(str(tmp_path) + "\n")
        for p, n in paths:
            f.write(f"{p}\t{n}\n")
    man = Manifest.load(str(man_path))

    for ftype, dim in [("fbank", 80), ("mfcc", 39)]:
        it = FeatsIterator(
            man, FeatsConfig(feature_type=ftype, batch_size=2, num_buckets=3),
            seed=1,
        )
        batch = next(iter(it))
        B, T, F = batch["features"].shape
        assert F == dim and B == 2
        assert np.isfinite(batch["features"]).all()
        # CMVN: near zero-mean unit-var over valid frames of each utt
        row = batch["features"][0][: batch["lengths"][0]]
        assert abs(row.mean()) < 0.2
    # logmel in [0, 1]-ish
    wav = rng.standard_normal(8000).astype(np.float32)
    from unispeech_tpu.data.feats import logmel_spectrogram

    lm = logmel_spectrogram(wav)
    assert lm.shape[1] == 80 and np.isfinite(lm).all()
    # dynamic range clamped to top_db (reference scales /top_db + 1, so the
    # spread is at most 1; the absolute level depends on signal loudness)
    assert lm.max() - lm.min() <= 1.0 + 1e-5


def test_s2t_dataset(tmp_path):
    """Column-TSV S2T dataset: wav + zip-slice + npy sources, targets."""
    from unispeech_tpu.data.dictionary import Dictionary
    from unispeech_tpu.data.s2t import S2TIterator, load_s2t_source, load_s2t_tsv

    rng = np.random.default_rng(5)
    # one plain wav, one zip-sliced wav, one npy feature file
    wav1 = rng.standard_normal(4000).astype(np.float32) * 0.1
    with open(tmp_path / "u1.wav", "wb") as f:
        f.write(_write_wav_bytes(wav1))
    wav2 = rng.standard_normal(5000).astype(np.float32) * 0.1
    shard = str(tmp_path / "s.zip")
    (off, ln), = _make_zip_shard(shard, [wav2])
    feats = rng.standard_normal((40, 13)).astype(np.float32)
    np.save(tmp_path / "u3.npy", feats)

    with open(tmp_path / "train.tsv", "w") as f:
        f.write("id\taudio\tn_frames\ttgt_text\n")
        f.write(f"u1\tu1.wav\t{len(wav1)}\thello world\n")
        f.write(f"u2\ts.zip:{off}:{ln}\t{len(wav2)}\tbye now\n")

    entries = load_s2t_tsv(str(tmp_path / "train.tsv"))
    assert [e.utt_id for e in entries] == ["u1", "u2"]
    s2 = load_s2t_source(entries[1])
    assert len(s2) == len(wav2)

    d = Dictionary()
    for w in "hello world bye now".split():
        d.add_symbol(w)
    it = S2TIterator(entries, tgt_dict=d, batch_size=2, num_buckets=2)
    batch = next(iter(it))
    assert batch["source"].shape[0] == 2
    assert batch["targets"].shape[0] == 2
    # eos-terminated targets
    for row, tl in zip(batch["targets"], batch["target_lengths"]):
        assert row[tl - 1] == d.eos()

    # npy feature source path
    from unispeech_tpu.data.s2t import S2TEntry

    got = load_s2t_source(S2TEntry("u3", str(tmp_path / "u3.npy"), 40))
    assert np.allclose(got, feats)
