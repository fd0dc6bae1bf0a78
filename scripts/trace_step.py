"""Capture a device trace of the bench train step and print top HLO ops.

Usage: python -u scripts/trace_step.py [outdir]
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace"
    sys.path.insert(0, "/root/repo")
    from scripts.profile_parts import _make_step

    step, state, batch = _make_step()
    rng = jax.random.PRNGKey(1)
    state2, m = step(state, batch, rng)
    print("compiled, loss:", float(m["loss"]), flush=True)

    import time
    t0 = time.perf_counter()
    for _ in range(20):
        _, m = step(state, batch, rng)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / 20
    print(f"step: {dt*1e3:.1f} ms  ({6*250000/16000/dt:.0f} audio-sec/s)",
          flush=True)

    with jax.profiler.trace(outdir):
        for _ in range(3):
            _, m = step(state, batch, rng)
        float(m["loss"])
    print("trace written", flush=True)

    files = glob.glob(outdir + "/**/*.xplane.pb", recursive=True)
    print(files, flush=True)


if __name__ == "__main__":
    main()
