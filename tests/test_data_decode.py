"""Tests for the data layer (batching, labels, mixing, iterators, dictionary)
and the decode layer (edit distance, WER, greedy/beam CTC)."""

import numpy as np
import pytest

from unispeech_tpu.data.batching import (
    batch_by_size,
    bucket_for,
    length_buckets,
    ordered_indices,
    shard_batches,
)
from unispeech_tpu.data.dictionary import Dictionary
from unispeech_tpu.data.labels import align_labels_to_frames, crop_labels
from unispeech_tpu.data.mixing import MixingConfig, mix_batch_device, mix_batch_host
from unispeech_tpu.decode.beam import CtcBeamDecoder, best_path_decode
from unispeech_tpu.decode.wer import WerScorer, edit_distance, post_process


# ---------------------------------------------------------------- batching
def test_batch_by_size_budget_and_coverage():
    rng = np.random.default_rng(0)
    sizes = rng.integers(100, 10_000, 500)
    order = np.argsort(sizes, kind="mergesort")
    batches = batch_by_size(order, sizes[order], max_tokens=40_000, bsz_mult=1)
    seen = np.concatenate(batches)
    assert sorted(seen.tolist()) == list(range(500))
    for b in batches[:-1]:
        assert len(b) * sizes[b].max() <= 40_000


def test_batch_by_size_max_sentences():
    sizes = np.full(100, 10)
    batches = batch_by_size(np.arange(100), sizes, max_tokens=0, max_sentences=8)
    assert all(len(b) <= 8 for b in batches)
    assert sum(len(b) for b in batches) == 100


def test_buckets_round_up():
    buckets = length_buckets(250_000, min_size=16_000, num_buckets=8, multiple=320)
    assert all(b % 320 == 0 for b in buckets)
    padded = bucket_for(np.asarray([16_001, 249_999]), buckets)
    assert padded[0] >= 16_001 and padded[1] >= 249_999


def test_ordered_indices_deterministic_and_sharding():
    sizes = np.random.default_rng(1).integers(1, 1000, 64)
    a = ordered_indices(sizes, seed=3, epoch=2)
    b = ordered_indices(sizes, seed=3, epoch=2)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, ordered_indices(sizes, seed=3, epoch=3))
    batches = [np.asarray([i]) for i in range(10)]
    s0 = shard_batches(batches, 4, 0)
    s3 = shard_batches(batches, 4, 3)
    assert len(s0) == len(s3) == 2  # tail dropped -> equal steps per host


# ---------------------------------------------------------------- labels
def test_align_labels_matches_reference_arithmetic():
    # reference: target_inds = arange(feat_tsz) * feat2tar_ratio; gather
    labels = np.arange(100, dtype=np.int32)
    out, valid = align_labels_to_frames(labels, num_frames=50, feat2tar_ratio=1.0)
    assert valid == 50
    assert np.array_equal(out[:50], labels[:50])
    # ratio 2.0: labels at double rate
    out, valid = align_labels_to_frames(labels, num_frames=60, feat2tar_ratio=2.0)
    assert valid == 50
    assert np.array_equal(out[:50], labels[np.arange(50) * 2])
    assert np.all(out[50:] == -1)


def test_crop_labels_sync():
    labels = np.arange(500, dtype=np.int32)
    # 16k audio, 50 Hz labels: 320 samples per label
    out = crop_labels(labels, audio_start=3200, audio_frames=32000,
                      sample_rate=16000, label_rate=50.0)
    assert out[0] == 10 and len(out) == 100


# ---------------------------------------------------------------- mixing
def test_mix_host_prob_zero_identity():
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((4, 8000)).astype(np.float32)
    out = mix_batch_host(rng, audio, None, MixingConfig(mixing_prob=0.0))
    assert np.array_equal(out, audio)


def test_mix_device_shapes_and_determinism():
    import jax

    audio = np.random.default_rng(0).standard_normal((4, 8000)).astype(np.float32)
    cfg = MixingConfig(mixing_prob=1.0)
    k = jax.random.PRNGKey(0)
    a = mix_batch_device(k, audio, None, cfg)
    b = mix_batch_device(k, audio, None, cfg)
    assert a.shape == audio.shape
    assert np.array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), audio)  # something mixed
    assert np.isfinite(np.asarray(a)).all()


def test_mix_host_snr_math_matches_reference_constants():
    """The added component's power must satisfy the reference scale law
    scale = sqrt(ref_pow / (src_pow * 10^(snr/10))) with full-utterance mean
    powers (utterance_mixing_dataset.py:392-431). Collapse the SNR range to
    a point so the scale is deterministic."""
    rng = np.random.default_rng(3)
    B, T = 2, 4000
    audio = rng.standard_normal((B, T)).astype(np.float32)
    snr0 = 7.0
    cfg = MixingConfig(
        mixing_prob=1.0, mixing_num=1,
        source_snr_low=snr0, source_snr_high=snr0,
    )
    out = mix_batch_host(np.random.default_rng(0), audio, None, cfg)
    for i in range(B):
        diff = out[i] - audio[i]
        nz = np.flatnonzero(np.abs(diff) > 0)
        if len(nz) == 0:  # c_len drew 0
            continue
        # reconstruct the scale from the overlaid segment: diff = src_seg*s
        # src row is unknown (could be any row incl. self); test the scale
        # against both candidates and require one to match
        seg = diff[nz[0] : nz[-1] + 1]
        ok = False
        for c in range(B):
            ref_pow = float(np.mean(audio[i] ** 2))
            src_pow = float(np.mean(audio[c] ** 2))
            expect = np.sqrt(ref_pow / (src_pow * 10 ** (snr0 / 10)))
            # segment values must be a contiguous slice of audio[c] * expect
            target = audio[c] * expect
            L = len(seg)
            windows = np.lib.stride_tricks.sliding_window_view(target, L)
            if np.isclose(np.abs(windows - seg).min(axis=1), 0, atol=1e-4).any():
                ok = True
        assert ok, f"row {i}: overlaid segment does not match scale law"


def _write_wav(path, samples, rate=16000):
    import wave

    pcm = np.clip(samples * 32767, -32768, 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())


def test_noise_store_tsv_and_precut(tmp_path):
    from unispeech_tpu.data.mixing import NoiseStore

    rng = np.random.default_rng(0)
    for i in range(3):
        _write_wav(tmp_path / f"n{i}.wav",
                   rng.standard_normal(6000).astype(np.float32) * 0.1)
    man = tmp_path / "noise.tsv"
    man.write_text(
        f"{tmp_path}\n" + "".join(f"n{i}.wav\t6000\n" for i in range(3))
    )
    store = NoiseStore(str(man))
    assert len(store) == 3
    clip = store.get(1)
    assert clip.shape == (6000,) and np.isfinite(clip).all()
    cut = store.precut(rng, 4, 8000)  # longer than source: zero-padded
    assert cut.shape == (4, 8000)
    assert np.abs(cut[:, 6000:]).max() == 0

    # noise actually mixes in
    audio = rng.standard_normal((2, 8000)).astype(np.float32)
    cfg = MixingConfig(mixing_prob=1.0, mixing_noise_prob=1.0)
    out = mix_batch_host(np.random.default_rng(1), audio, None, cfg, noise=store)
    assert not np.array_equal(out, audio)
    assert np.isfinite(out).all()


def test_noise_store_h5_json_format(tmp_path):
    h5py = pytest.importorskip("h5py")
    import json

    from unispeech_tpu.data.mixing import NoiseStore

    wav = (np.random.default_rng(0).standard_normal(10000) * 8000).astype(
        np.int16
    )
    h5path = str(tmp_path / "noise.h5")
    with h5py.File(h5path, "w") as f:
        f.create_dataset("wav", data=wav)
    entries = [
        {"loc": f"{h5path}\tk0\t0\t4000"},
        {"loc": f"{h5path}\tk1\t4000\t10000"},
    ]
    jpath = tmp_path / "noise.json"
    jpath.write_text(json.dumps(entries))
    store = NoiseStore(str(jpath))
    assert len(store) == 2
    c0 = store.get(0)
    assert c0.shape == (4000,)
    np.testing.assert_allclose(
        c0, wav[:4000].astype(np.float32) / np.iinfo(np.int16).max
    )


# ---------------------------------------------------------------- dictionary
def test_dictionary_roundtrip(tmp_path):
    d = Dictionary.letters()
    assert d.blank() == d.bos() == 0
    ids = d.encode_line("H E L L O |")
    assert d.string(ids) == "H E L L O |"
    p = tmp_path / "dict.ltr.txt"
    d.save(str(p))
    d2 = Dictionary.load(str(p))
    assert d2.symbols == d.symbols


def test_dictionary_json(tmp_path):
    import json

    p = tmp_path / "vocab.json"
    p.write_text(json.dumps({"a": 4, "b": 5, "c": 6}))
    d = Dictionary.load(str(p))
    assert d.index("b") == 5 and len(d) == 7


# ---------------------------------------------------------------- decode
def _brute_edit(a, b):
    import functools

    @functools.lru_cache(maxsize=None)
    def go(i, j):
        if i == 0:
            return j
        if j == 0:
            return i
        return min(
            go(i - 1, j) + 1,
            go(i, j - 1) + 1,
            go(i - 1, j - 1) + (a[i - 1] != b[j - 1]),
        )

    return go(len(a), len(b))


def test_edit_distance_vs_bruteforce():
    rng = np.random.default_rng(0)
    for _ in range(30):
        a = rng.integers(0, 4, rng.integers(0, 12)).tolist()
        b = rng.integers(0, 4, rng.integers(0, 12)).tolist()
        assert edit_distance(a, b) == _brute_edit(tuple(a), tuple(b))


def test_wer_scorer_and_post_process():
    s = WerScorer()
    s.add("the cat sat", "the cat sat")
    assert s.wer == 0.0
    s.add("the dog sat", "the cat sat")
    assert s.wer == pytest.approx(100.0 / 6)
    assert post_process("H E L L O | W O R L D |", "letter") == "HELLO WORLD"


def test_best_path_matches_jax_greedy():
    import jax.numpy as jnp

    from unispeech_tpu.ops.ctc import greedy_decode

    rng = np.random.default_rng(0)
    logits = rng.standard_normal((3, 20, 6)).astype(np.float32)
    lengths = np.asarray([20, 15, 7], np.int32)
    toks, lens = greedy_decode(jnp.asarray(logits), jnp.asarray(lengths))
    for i in range(3):
        ref = best_path_decode(logits[i], int(lengths[i]))
        got = np.asarray(toks[i][: int(lens[i])]).tolist()
        assert got == ref


def test_beam_decoder_finds_high_prob_path():
    # emissions strongly favoring "a b" (ids 1, 2) with blanks between
    T, V = 8, 4
    lp = np.full((T, V), -10.0, np.float32)
    seq = [0, 1, 1, 0, 2, 2, 0, 0]
    for t, v in enumerate(seq):
        lp[t, v] = -0.01
    dec = CtcBeamDecoder(beam=8)
    units, words, score = dec.decode(lp)[0]
    assert units == [1, 2]


def test_beam_decoder_lexicon_constrains():
    # units: 1='a', 2='b', 3='|' (silence). lexicon only contains "ab".
    T, V = 10, 5
    rng = np.random.default_rng(0)
    lp = np.log(rng.dirichlet(np.ones(V), size=T)).astype(np.float32)
    lex = {"ab": [[1, 2]]}
    dec = CtcBeamDecoder(beam=16, silence_id=3, lexicon=lex, lm_weight=0.0,
                         word_score=0.0)
    results = dec.decode(lp)
    for units, words, _ in results:
        # every completed word must be "ab"
        assert all(w == "ab" for w in words)


# ---------------------------------------------------------------- iterators
def test_pretrain_iterator_end_to_end(tmp_path):
    import wave as wavemod

    from unispeech_tpu.data.dataset import DataConfig, PretrainIterator
    from unispeech_tpu.data.labels import LabelFile
    from unispeech_tpu.data.manifest import Manifest

    rng = np.random.default_rng(0)
    paths, sizes = [], []
    km_lines = []
    for i in range(6):
        n = int(rng.integers(8000, 24000))
        wav = (rng.standard_normal(n) * 3000).astype(np.int16)
        p = tmp_path / f"u{i}.wav"
        with wavemod.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(wav.tobytes())
        paths.append(f"u{i}.wav")
        sizes.append(n)
        km_lines.append(" ".join(str(int(x)) for x in rng.integers(0, 10, n // 320)))
    man = Manifest(str(tmp_path), paths, np.asarray(sizes))
    kmp = tmp_path / "train.km"
    kmp.write_text("\n".join(km_lines) + "\n")

    cfg = DataConfig(
        max_sample_size=16000, min_sample_size=4000, max_tokens=40000,
        num_buckets=4, required_batch_size_multiple=1,
    )
    it = PretrainIterator(
        man, cfg, label_files=[LabelFile(str(kmp), 50.0)], seed=7
    )
    batches = list(it.epoch_batches(1))
    assert batches, "no batches"
    total = 0
    shapes = set()
    for b in batches:
        B, T = b["source"].shape
        shapes.add((B, T))
        total += int((b["lengths"] > 0).sum())  # zero rows = static-shape pad
        assert b["targets"].shape[0] == B and b["targets"].ndim == 3
        assert (b["lengths"] <= T).all()
        assert b["target_valid"].shape == b["targets"].shape
        # fixed shapes: B is a pure function of the bucket length
        assert B == it.fixed_bsz(T)
        # padded rows contribute no loss weight
        assert (b["target_valid"][b["lengths"] == 0] == 0).all()
    assert total == 6
    assert len(shapes) <= cfg.num_buckets
    # determinism
    b2 = list(it.epoch_batches(1))
    assert np.array_equal(batches[0]["source"], b2[0]["source"])
    # resumable state
    it2 = PretrainIterator(
        man, cfg, label_files=[LabelFile(str(kmp), 50.0)], seed=7
    )
    it2.load_state_dict({"epoch": 1, "batch_offset": 1})
    nxt = next(iter(it2))
    if len(batches) > 1:
        assert np.array_equal(nxt["source"], batches[1]["source"])


def test_finetune_iterator(tmp_path):
    import wave as wavemod

    from unispeech_tpu.data.dataset import DataConfig, FinetuneIterator
    from unispeech_tpu.data.dictionary import Dictionary
    from unispeech_tpu.data.manifest import Manifest

    rng = np.random.default_rng(0)
    paths, sizes, texts = [], [], []
    for i in range(4):
        n = 8000
        wav = (rng.standard_normal(n) * 3000).astype(np.int16)
        p = tmp_path / f"u{i}.wav"
        with wavemod.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(wav.tobytes())
        paths.append(f"u{i}.wav")
        sizes.append(n)
        texts.append("H I |" if i % 2 else "Y O |")
    man = Manifest(str(tmp_path), paths, np.asarray(sizes))
    d = Dictionary.letters()
    cfg = DataConfig(
        max_sample_size=16000, min_sample_size=1000, max_tokens=64000,
        num_buckets=2, required_batch_size_multiple=1,
    )
    it = FinetuneIterator(man, cfg, texts, d, seed=1)
    b = next(iter(it.epoch_batches(1)))
    assert "labels" in b and "label_lengths" in b
    valid = b["lengths"] > 0
    assert (b["label_lengths"][valid] == 3).all()
    assert (b["labels"][valid][:, :3] != d.pad()).all()
    # zero-padded rows carry empty labels
    assert (b["label_lengths"][~valid] == 0).all()


def test_native_packer_matches_python():
    from unispeech_tpu.native import batch_by_size_native, get_lib

    if get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(3)
    sizes = np.sort(rng.integers(50, 5000, 333))
    # python fallback: force by calling the scan directly via monkeypatched
    # native return of None
    import unispeech_tpu.data.batching as B
    import unispeech_tpu.native as N

    native = B.batch_by_size(np.arange(333), sizes, max_tokens=20_000, bsz_mult=4)
    orig = N.batch_by_size_native
    try:
        N.batch_by_size_native = lambda *a, **k: None
        py = B.batch_by_size(np.arange(333), sizes, max_tokens=20_000, bsz_mult=4)
    finally:
        N.batch_by_size_native = orig
    assert len(native) == len(py)
    for a, b in zip(native, py):
        assert np.array_equal(a, b)


def test_native_edit_distance_matches_python():
    from unispeech_tpu.native import edit_distance_native, get_lib

    if get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(5)
    for _ in range(20):
        a = rng.integers(0, 5, rng.integers(0, 15)).tolist()
        b = rng.integers(0, 5, rng.integers(0, 15)).tolist()
        assert edit_distance_native(a, b) == _brute_edit(tuple(a), tuple(b))


def test_dictionary_spm_processor_path():
    """encode_line routes raw text through an attached sentencepiece
    processor (reference dictionary.py:50-54,344-345). The sandbox has no
    sentencepiece wheel, so a stand-in processor exercises the plumbing."""
    from unispeech_tpu.data.dictionary import Dictionary

    d = Dictionary()
    for p in ["▁he", "llo", "▁wor", "ld"]:
        d.add_symbol(p)

    class FakeSpm:
        def encode_as_pieces(self, line):
            assert line == "hello world"
            return ["▁he", "llo", "▁wor", "ld"]

    d.processor = FakeSpm()
    ids = d.encode_line("hello world")
    assert [d[i] for i in ids] == ["▁he", "llo", "▁wor", "ld"]
    # post_process("sentencepiece") restores the raw text
    from unispeech_tpu.decode.wer import post_process

    assert post_process(d.string(ids), "sentencepiece") == "hello world"

    # without a processor: whitespace tokens (unchanged behavior)
    d.processor = None
    ids2 = d.encode_line("▁he llo")
    assert [d[i] for i in ids2] == ["▁he", "llo"]
