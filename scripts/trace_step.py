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
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa

    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())

    import re
    from collections import defaultdict

    CATS = [
        ("attn_kernel", r"self_attn"),
        ("conv_frontend", r"(49167|49168|24583|24584|12291|12292|6145|6146|"
                          r"3071|3072\b.*512|1535|1536\b.*512|245840)"),
        ("ffn", r"(768,3072|3072,768|6,768,3072)"),
        ("optimizer", r"14146560|1178880"),
        ("bias_grad", r"12,6,768,768|12,768,768|768,1535"),
        ("posconv", r"16,48|769"),
        ("copies", r"^%(copy|bitcast|reshape|transpose|pad\b)"),
    ]

    def cat(name):
        for c, pat in CATS:
            if re.search(pat, name):
                return c
        return None

    for plane in xspace.planes:
        if plane.name != "/device:TPU:0":
            continue
        ev_names = {i: m.name for i, m in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            cats = defaultdict(float)
            members = defaultdict(lambda: defaultdict(float))
            other = defaultdict(float)
            total = 0.0
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, "?")
                if name.startswith("%while"):
                    continue  # outer scan events double-count their bodies
                ms = ev.duration_ps / 1e9 / 3
                total += ms
                c = cat(name)
                key = re.sub(r"\.\d+", "", name)[:90]
                if c:
                    cats[c] += ms
                    members[c][key] += ms
                else:
                    other[key] += ms
            print(f"\nleaf total {total:.1f} ms/step")
            for c, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
                print(f"  {c:16s} {ms:7.2f} ms")
                for k, v in sorted(members[c].items(), key=lambda kv: -kv[1])[:6]:
                    print(f"      {v:7.3f}  {k}")
            print(f"  OTHER {sum(other.values()):7.2f}; top:")
            for name, ms in sorted(other.items(), key=lambda kv: -kv[1])[:10]:
                print(f"      {ms:7.3f}  {name}")


if __name__ == "__main__":
    main()
