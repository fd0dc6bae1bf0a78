"""Background input prefetch.

The reference keeps the accelerator fed with DataLoader worker processes +
buffered epoch iterators (iterators.py:225 `buffer_size`, SURVEY.md §3.1
worker-process boundary). The TPU-era equivalent: collation (soundfile
reads, numpy mixing) runs on host threads *ahead* of the train loop while
the chip executes the previous steps, overlapping input latency with
device compute.

Two layers:
  * `prefetch(it, depth)` — a daemon thread drains `it` into a bounded
    queue; the consumer never waits unless the producer is genuinely
    slower than the chip.
  * `parallel_map_unordered_io` — an intra-batch thread pool for audio
    file reads (soundfile releases the GIL during IO/decode).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, List, Optional, Sequence, TypeVar

T = TypeVar("T")
U = TypeVar("U")

_SENTINEL = object()


class PrefetchIterator(Iterator[T]):
    """Iterate `src` on a background thread through a bounded queue.

    Exceptions in the producer are re-raised in the consumer. The thread is
    a daemon and additionally stops promptly on `close()` (drains without
    blocking the producer forever via the queue timeout).
    """

    def __init__(self, src: Iterable[T], depth: int = 4):
        self._q: queue.Queue = queue.Queue(maxsize=max(depth, 1))
        self._err: Optional[BaseException] = None
        self._closed = threading.Event()
        self._thread = threading.Thread(
            target=self._produce, args=(iter(src),), daemon=True
        )
        self._thread.start()

    def _produce(self, it: Iterator[T]) -> None:
        try:
            for item in it:
                while not self._closed.is_set():
                    try:
                        self._q.put(item, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if self._closed.is_set():
                    return
        except BaseException as e:  # noqa: BLE001 — surfaced to consumer
            self._err = e
        while not self._closed.is_set():
            try:
                self._q.put(_SENTINEL, timeout=0.5)
                return
            except queue.Full:
                continue

    def __iter__(self) -> "PrefetchIterator[T]":
        return self

    def __next__(self) -> T:
        item = self._q.get()
        if item is _SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self) -> None:
        self._closed.set()


def prefetch(src: Iterable[T], depth: int = 4) -> PrefetchIterator[T]:
    return PrefetchIterator(src, depth)


_IO_POOL: Optional[ThreadPoolExecutor] = None
_IO_POOL_LOCK = threading.Lock()


def _io_pool(workers: int) -> ThreadPoolExecutor:
    global _IO_POOL
    with _IO_POOL_LOCK:
        if _IO_POOL is None:
            _IO_POOL = ThreadPoolExecutor(
                max_workers=workers, thread_name_prefix="audio-io"
            )
        return _IO_POOL


def parallel_map_io(
    fn: Callable[[T], U], items: Sequence[T], workers: int = 8
) -> List[U]:
    """Order-preserving thread-pool map for IO-bound per-item work."""
    if len(items) <= 1 or workers <= 1:
        return [fn(x) for x in items]
    return list(_io_pool(workers).map(fn, items))
