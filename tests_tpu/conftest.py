"""On-chip (TPU) tests — run with plain `pytest tests_tpu/ -q` on a machine
with the tunneled TPU. NOT collected by the CPU suite (`pytest tests/`).

These cover what interpret mode cannot: the Mosaic-compiled kernels and the
TPU PRNG (in-kernel dropout)."""

import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax


def _on_tpu() -> bool:
    try:
        dev = jax.devices()[0]
    except RuntimeError:
        return False
    return jax.default_backend() == "tpu" or "TPU" in getattr(
        dev, "device_kind", ""
    )


def pytest_collection_modifyitems(config, items):
    if _on_tpu():
        return
    skip = pytest.mark.skip(reason="requires the real TPU chip")
    for item in items:
        item.add_marker(skip)
