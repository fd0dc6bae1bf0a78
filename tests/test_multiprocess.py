"""Real multi-process SPMD: 2 jax.distributed processes x 4 CPU devices
must reproduce the single-process 8-device losses exactly (round-4 verdict
item 3). First genuine execution of parallel/bootstrap.py and the
per-process data-shard path with process_count > 1. Reference analog:
distributed_init (/root/reference/src/fairseq/distributed/utils.py:255-297).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "multiproc_train.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _clean_env():
    env = dict(os.environ)
    # the subprocesses set their own platform/device-count flags
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    return env


def test_two_process_matches_single_process():
    env = _clean_env()
    port = _free_port()
    workers = [
        subprocess.Popen(
            [sys.executable, SCRIPT, "worker", str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=REPO, text=True,
        )
        for pid in range(2)
    ]
    single = subprocess.run(
        [sys.executable, SCRIPT, "single"],
        capture_output=True, env=env, cwd=REPO, text=True, timeout=560,
    )
    outs = []
    for w in workers:
        out, err = w.communicate(timeout=560)
        assert w.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    assert single.returncode == 0, f"single failed:\n{single.stderr[-3000:]}"
    ref = json.loads(single.stdout.strip().splitlines()[-1])

    # both workers see the same global metrics
    np.testing.assert_allclose(outs[0]["losses"], outs[1]["losses"], rtol=0)
    # and they match the single-process run (same global batch, same mesh
    # partitioning; tiny fp32 tolerance for cross-process reduction order)
    np.testing.assert_allclose(
        outs[0]["losses"], ref["losses"], rtol=2e-5
    )
    np.testing.assert_allclose(
        outs[0]["grad_norms"], ref["grad_norms"], rtol=2e-4
    )
    # training actually progressed
    assert ref["losses"][-1] != ref["losses"][0]
