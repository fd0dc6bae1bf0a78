"""On-chip verification of the fused attention kernel.

Thin runner: executes the compiled-on-silicon test suite
(tests_tpu/test_flash_tpu.py — dropout determinism/statistics/mean-field,
backward-vs-recovered-mask gradients, bf16 parity, train-step HLO
presence) and records the outcome to VERIFY_TPU_r04.json at the repo root.

Run from anywhere: python scripts/verify_flash_tpu.py
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests_tpu/", "-q", "--tb=short"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=3000,
    )
    tail = "\n".join(proc.stdout.splitlines()[-15:])
    print(tail)
    record = {
        "suite": "tests_tpu/test_flash_tpu.py",
        "rc": proc.returncode,
        "seconds": round(time.time() - t0, 1),
        "tail": proc.stdout.splitlines()[-1] if proc.stdout else "",
        "when": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open(os.path.join(REPO, "VERIFY_TPU_r04.json"), "w") as f:
        json.dump(record, f, indent=1)
    print("recorded ->", os.path.join(REPO, "VERIFY_TPU_r04.json"))
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main())
