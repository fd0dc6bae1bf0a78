"""Device-utilization anatomy of the bench step: leaf-op busy time vs
wall span vs gaps.

The R4 trace table summed leaf XLA-op durations (~75-77 ms) while the bench
wall clock says ~97 ms/step with dispatch fully pipelined (INNER sweep flat)
— so ~20 ms/step is either (a) device idle BETWEEN ops (launch overhead /
DMA stalls / infeed) or (b) events the leaf sum misses. This script
computes, from the xplane proto: per-step interval-union busy time, the
step span (first op start -> last op end), the gap total, the op count,
and the largest individual gaps with their neighboring ops.

Usage: BENCH_INNER=1 python -u scripts/trace_gap.py [outdir]
"""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

N_TRACE = 3


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace_gap"
    from bench import INNER, build_step

    step, state, batch, rng = build_step()
    t0 = time.perf_counter()
    state, m = step(state, batch, rng)
    import numpy as np

    print(f"compiled in {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(10):
        state, m = step(state, batch, rng)
    float(np.asarray(m["loss_per_sample"]).reshape(-1)[-1])
    wall = (time.perf_counter() - t0) / (10 * INNER)
    print(f"wall {wall*1e3:.1f} ms/step", flush=True)

    with jax.profiler.trace(outdir):
        for _ in range(N_TRACE):
            state, m = step(state, batch, rng)
        float(np.asarray(m["loss_per_sample"]).reshape(-1)[-1])
    print("trace written", flush=True)

    files = glob.glob(outdir + "/**/*.xplane.pb", recursive=True)
    path = max(files, key=os.path.getmtime)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())

    for plane in xspace.planes:
        if plane.name != "/device:TPU:0":
            continue
        ev_names = {i: md.name for i, md in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            evs = []
            leaf_sum = 0.0
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, "?")
                if name.startswith("%while"):
                    continue
                start = ev.offset_ps / 1e9  # ms
                dur = ev.duration_ps / 1e9
                leaf_sum += dur
                evs.append((start, start + dur, name))
            evs.sort()
            if not evs:
                continue
            span = evs[-1][1] - evs[0][0]
            # interval union
            busy = 0.0
            cur_s, cur_e = evs[0][0], evs[0][1]
            gaps = []
            for s, e, name in evs[1:]:
                if s > cur_e:
                    gaps.append((s - cur_e, cur_e, name))
                    busy += cur_e - cur_s
                    cur_s, cur_e = s, e
                else:
                    cur_e = max(cur_e, e)
            busy += cur_e - cur_s
            n_steps = N_TRACE * INNER
            print(f"\nops/step: {len(evs)//n_steps}")
            print(f"leaf-sum {leaf_sum/n_steps:7.2f} ms/step")
            print(f"busy     {busy/n_steps:7.2f} ms/step (interval union)")
            print(f"span     {span/n_steps:7.2f} ms/step")
            print(f"gaps     {(span-busy)/n_steps:7.2f} ms/step "
                  f"({sum(1 for g in gaps if g[0] > 0.01)} gaps >10us)")
            print("largest gaps (ms, following op):")
            for g, at, name in sorted(gaps, reverse=True)[:15]:
                print(f"  {g:7.3f}  -> {name[:100]}")


if __name__ == "__main__":
    main()
