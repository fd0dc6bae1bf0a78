"""Numerical-failure localization + compile watchdog.

Replaces the reference's NanDetector (module fwd/bwd hooks printing the first
NaN/Inf producer — /root/reference/src/fairseq/nan_detector.py:14-60) and the
XLA recompilation check (`_check_xla_compilation`, trainer.py:1387-1402) with
JAX-idiomatic equivalents: pytree scans over params/grads/metrics and a
jit-cache-size watchdog.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def nonfinite_paths(tree: Any, max_report: int = 10) -> List[Tuple[str, str]]:
    """Return [(path, kind)] for leaves containing NaN/Inf (host-side)."""
    out: List[Tuple[str, str]] = []

    def visit(path, leaf):
        if len(out) >= max_report:
            return
        arr = np.asarray(leaf)
        if not np.issubdtype(arr.dtype, np.floating):
            return
        if np.isnan(arr).any():
            out.append(("/".join(str(getattr(k, "key", k)) for k in path), "nan"))
        elif np.isinf(arr).any():
            out.append(("/".join(str(getattr(k, "key", k)) for k in path), "inf"))

    jax.tree_util.tree_map_with_path(visit, tree)
    return out


def assert_finite(tree: Any, what: str = "tree") -> None:
    """Raise with the offending paths if any leaf is non-finite
    (the NanDetector re-run analog: call on grads after a bad loss)."""
    bad = nonfinite_paths(tree)
    if bad:
        lines = "\n".join(f"  {p}: {k}" for p, k in bad)
        raise FloatingPointError(f"non-finite values in {what}:\n{lines}")


def grad_norms_by_module(grads: Any, depth: int = 2) -> Dict[str, float]:
    """Per-submodule gradient norms (NanDetector's exit dump analog,
    nan_detector.py:42-60)."""
    acc: Dict[str, float] = {}

    def visit(path, leaf):
        key = "/".join(str(getattr(k, "key", k)) for k in path[:depth])
        acc[key] = acc.get(key, 0.0) + float(jnp.sum(jnp.square(leaf)))

    jax.tree_util.tree_map_with_path(visit, grads)
    return {k: v**0.5 for k, v in acc.items()}


class CompileWatchdog:
    """Warn when a jitted function keeps recompiling (shape leaks).

    The reference warns via torch_xla metrics (trainer.py:1387-1402); here we
    track jax's compilation cache stats per tagged function.
    """

    def __init__(self, warn_after: int = 3):
        self.warn_after = warn_after
        self._counts: Dict[str, int] = {}

    def track(self, tag: str, jitted_fn) -> None:
        try:
            n = jitted_fn._cache_size()
        except Exception:
            return
        prev = self._counts.get(tag, 0)
        if n > prev:
            self._counts[tag] = n
            if n >= self.warn_after:
                logger.warning(
                    "%s compiled %d distinct programs — input shapes are not "
                    "stable (check bucketing)", tag, n,
                )


def profile_trace(log_dir: str):
    """Context manager: jax.profiler trace (xplane), the `--profile` analog
    (fairseq_cli/train.py:498-501)."""
    return jax.profiler.trace(log_dir, create_perfetto_link=False)


class HangWatchdog:
    """Detect hung device steps (the reference wraps distributed calls in
    DistributedTimeoutWrapper threads that signal the process after a
    timeout — /root/reference/src/fairseq/distributed/
    distributed_timeout_wrapper.py:14-90). Single-controller JAX cannot
    hang on peer workers the same way, but a device step CAN wedge on a
    bad collective or runtime fault; this watchdog arms a timer around
    each step and dumps every thread's stack when it fires, then either
    warns or kills the process (so an orchestrator can restart from the
    checkpoint).
    """

    def __init__(self, timeout_s: float = 600.0, kill: bool = False):
        import threading

        self.timeout_s = timeout_s
        self.kill = kill
        self._timer: Optional[Any] = None
        self._lock = threading.Lock()
        self.fired = 0

    def _on_timeout(self) -> None:
        import faulthandler
        import os
        import sys

        self.fired += 1
        logger.error(
            "step exceeded %.0fs — dumping stacks%s", self.timeout_s,
            " and aborting" if self.kill else "",
        )
        faulthandler.dump_traceback(file=sys.stderr)
        if self.kill:
            os._exit(17)  # orchestrators treat nonzero as restart-from-ckpt

    def arm(self) -> None:
        import threading

        with self._lock:
            self._cancel_locked()
            self._timer = threading.Timer(self.timeout_s, self._on_timeout)
            self._timer.daemon = True
            self._timer.start()

    def disarm(self) -> None:
        with self._lock:
            self._cancel_locked()

    def _cancel_locked(self) -> None:
        if self._timer is not None:
            self._timer.cancel()
            self._timer = None
