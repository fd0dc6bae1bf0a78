"""Capture a device trace of the bench train step and print top HLO ops.

Usage: python -u scripts/trace_step.py [outdir]
One TPU compile (the bench step); the trace is parsed locally from the
xplane protobuf, aggregating device-plane event durations by op name.
"""

import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace"
    from bench import build_step

    step, state, batch, rng = build_step()
    t0 = time.perf_counter()
    state, m = step(state, batch, rng)
    print(f"compiled in {time.perf_counter()-t0:.1f}s "
          f"loss={float(m['loss_per_sample']):.3f}", flush=True)

    t0 = time.perf_counter()
    for _ in range(20):
        state, m = step(state, batch, rng)
    float(m["loss_per_sample"])
    dt = (time.perf_counter() - t0) / 20
    audio = batch["source"].shape[0] * batch["source"].shape[1] / 16000.0
    print(f"step: {dt*1e3:.1f} ms  ({audio/dt:.0f} audio-sec/s)", flush=True)

    with jax.profiler.trace(outdir):
        for _ in range(3):
            state, m = step(state, batch, rng)
        float(m["loss_per_sample"])
    print("trace written", flush=True)

    files = glob.glob(outdir + "/**/*.xplane.pb", recursive=True)
    if not files:
        print("no xplane file found", flush=True)
        return
    path = max(files, key=os.path.getmtime)
    from tensorflow.core.profiler.protobuf import xplane_pb2  # noqa

    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())

    for plane in xspace.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        ev_names = {i: m.name for i, m in plane.event_metadata.items()}
        totals = defaultdict(float)
        for line in plane.lines:
            lname = line.name.lower()
            if "step" in lname or "xla op" in lname:
                continue  # avoid double counting; use XLA Modules/ops lines
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, "?")
                totals[name] += ev.duration_ps / 1e9  # -> ms
        if not totals:
            continue
        print(f"\n== plane: {plane.name} (top 40 by total ms over 3 steps) ==")
        for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:40]:
            print(f"{ms/3:9.3f} ms  {name[:110]}")
        lines_names = [l.name for l in plane.lines]
        print("lines:", lines_names[:20])


if __name__ == "__main__":
    main()
