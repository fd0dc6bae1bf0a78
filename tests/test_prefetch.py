"""Async input prefetch (reference DataLoader-worker analog)."""

import time

import numpy as np
import pytest

from unispeech_tpu.data.prefetch import PrefetchIterator, parallel_map_io, prefetch


def test_prefetch_order_and_completeness():
    src = list(range(100))
    out = list(prefetch(iter(src), depth=3))
    assert out == src


def test_prefetch_overlaps_producer_latency():
    def slow():
        for i in range(6):
            time.sleep(0.05)
            yield i

    it = prefetch(slow(), depth=8)
    time.sleep(0.4)  # producer fills the queue while consumer is "busy"
    t0 = time.perf_counter()
    out = list(it)
    dt = time.perf_counter() - t0
    assert out == list(range(6))
    assert dt < 0.15, f"queue was not pre-filled (drain took {dt:.3f}s)"


def test_prefetch_propagates_exceptions():
    def bad():
        yield 1
        raise ValueError("boom")

    it = prefetch(bad(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        list(it)


def test_prefetch_close_stops_producer():
    produced = []

    def src():
        for i in range(10_000):
            produced.append(i)
            yield i

    it = PrefetchIterator(src(), depth=2)
    next(it)
    it.close()
    time.sleep(0.7)
    n = len(produced)
    time.sleep(0.7)
    assert len(produced) == n  # producer stopped after close


def test_parallel_map_io_preserves_order():
    xs = list(range(50))
    out = parallel_map_io(lambda x: x * x, xs, workers=8)
    assert out == [x * x for x in xs]


def test_iterator_collate_parallel_load_deterministic(tmp_path):
    """Parallel audio reads must not change the (seed, epoch) batch stream."""
    import wave

    from unispeech_tpu.data.dataset import DataConfig, PretrainIterator
    from unispeech_tpu.data.manifest import Manifest

    rng = np.random.default_rng(0)
    rows = []
    for i in range(12):
        n = int(rng.integers(4000, 9000))
        pcm = np.clip(rng.standard_normal(n) * 0.1 * 32767, -32768, 32767).astype(
            np.int16
        )
        with wave.open(str(tmp_path / f"u{i}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(pcm.tobytes())
        rows.append(f"u{i}.wav\t{n}")
    (tmp_path / "m.tsv").write_text(f"{tmp_path}\n" + "\n".join(rows) + "\n")

    man = Manifest.load(str(tmp_path / "m.tsv"))
    mk = lambda workers: PretrainIterator(
        man,
        DataConfig(
            max_tokens=30_000, min_sample_size=1000, max_sample_size=6000,
            num_workers=workers,
        ),
        seed=5,
    )
    serial = [b["source"] for b in mk(1).epoch_batches(1)]
    parallel = [b["source"] for b in mk(8).epoch_batches(1)]
    assert len(serial) == len(parallel) > 0
    for a, b in zip(serial, parallel):
        np.testing.assert_array_equal(a, b)
