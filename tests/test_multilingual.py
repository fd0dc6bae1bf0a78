"""Multilingual temperature resampling parity
(/root/reference/src/fairseq/tasks/audio_pretraining.py:211-219,270-308)."""

import numpy as np
import pytest

from unispeech_tpu.data.dataset import DataConfig, PretrainIterator
from unispeech_tpu.data.manifest import Manifest
from unispeech_tpu.data.multilingual import (
    concat_manifests,
    multilang_sample_probs,
    multilang_size_ratios,
    resampled_rows,
)


def test_sample_probs_match_reference_formula():
    lens = np.array([1000.0, 100.0, 10.0])
    for alpha in (1.0, 0.5, 0.2):
        p = multilang_sample_probs(lens, alpha)
        prob = lens / lens.sum()
        sm = prob**alpha
        np.testing.assert_allclose(p, sm / sm.sum(), rtol=1e-12)
        assert np.isclose(p.sum(), 1.0)
    # alpha < 1 upsamples low-resource languages
    p = multilang_sample_probs(lens, 0.5)
    assert p[2] > 10.0 / 1110.0


def test_size_ratios_conserve_total():
    lens = np.array([500.0, 50.0])
    r = multilang_size_ratios(lens, 0.5)
    # sum over languages of n_l * r_l == N
    assert np.isclose((lens * r).sum(), lens.sum())
    assert r[1] > 1.0 > r[0]  # small language upsampled


def test_resampled_rows_semantics():
    rows = np.arange(100, 150)
    up = resampled_rows(rows, 2.5, seed=3, epoch=1, lang_id=0)
    assert len(up) == int(np.ceil(50 * 2.5))
    assert set(up) <= set(rows)
    down = resampled_rows(rows, 0.5, seed=3, epoch=1, lang_id=0)
    assert len(down) == 25 and len(set(down)) == 25  # without replacement
    # deterministic per (seed, epoch, lang); varies by epoch
    again = resampled_rows(rows, 2.5, seed=3, epoch=1, lang_id=0)
    np.testing.assert_array_equal(up, again)
    other = resampled_rows(rows, 2.5, seed=3, epoch=2, lang_id=0)
    assert not np.array_equal(up, other)


def _manifest(n, size, prefix):
    return Manifest(
        root=f"/{prefix}",
        paths=[f"{i}.wav" for i in range(n)],
        sizes=np.full(n, size, dtype=np.int64),
    )


def test_concat_manifests_groups_and_abspath():
    a = _manifest(3, 16000, "a")
    b = _manifest(2, 16000, "b")
    man, groups = concat_manifests([a, b])
    assert len(man) == 5
    np.testing.assert_array_equal(groups[0], [0, 1, 2])
    np.testing.assert_array_equal(groups[1], [3, 4])
    assert man.abspath(0) == "/a/0.wav"
    assert man.abspath(3) == "/b/0.wav"


def test_iterator_epoch_pool_upsamples_minority():
    big = _manifest(200, 40000, "big")
    small = _manifest(10, 40000, "small")
    man, groups = concat_manifests([big, small])
    it = PretrainIterator(
        man,
        DataConfig(max_tokens=400_000, min_sample_size=1000),
        lang_groups=groups,
        multilang_alpha=0.2,
        seed=7,
    )
    pool = it._epoch_rows(1)
    n_small = int(np.isin(pool, groups[1]).sum())
    n_big = int(np.isin(pool, groups[0]).sum())
    # alpha=0.2 must upsample the 10-row language well beyond its raw share
    assert n_small / (n_small + n_big) > 0.2
    # pool is a multiset over valid rows only
    assert set(pool.tolist()) <= set(np.concatenate(groups).tolist())
    # total epoch size is conserved (sum n_l * r_l == N)
    assert abs(len(pool) - len(man)) <= len(groups)  # ceil slack per language
    # deterministic plans given (seed, epoch)
    np.testing.assert_array_equal(pool, it._epoch_rows(1))
    assert not np.array_equal(pool, it._epoch_rows(2))


def test_iterator_without_groups_unchanged():
    man = _manifest(50, 40000, "x")
    it = PretrainIterator(man, DataConfig(max_tokens=400_000, min_sample_size=1000), seed=1)
    np.testing.assert_array_equal(it._epoch_rows(1), it._keep)
