"""Test harness config: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere in the test process.
"""

import os

# Force CPU regardless of the session env: the environment ships an 'axon'
# jax plugin that tunnels to a single real TPU chip and overrides
# JAX_PLATFORMS at import time, so the env var alone is not enough — we must
# also update jax.config after import (before any device use).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_wavlm_module():
    """Import the reference standalone WavLM (torch CPU) as a test oracle.

    The reference model at /root/reference/WavLM does `from modules import
    ...`, so its directory must head sys.path.
    """
    torch = pytest.importorskip("torch")
    ref_dir = str(REFERENCE / "WavLM")
    if ref_dir not in sys.path:
        sys.path.insert(0, ref_dir)
    import WavLM as ref_wavlm  # noqa

    return ref_wavlm
