"""Offline xplane analysis: categorized per-step device-time budget.

Parses an existing trace dir (no TPU needed) and prints ALL op time
bucketed so the categories sum to the true busy time — fixes the R4 table
whose buckets summed to ~77 ms while the device was busy ~95 ms.

Usage: python scripts/trace_offline.py [tracedir] [n_steps]
"""

import glob
import os
import re
import sys
from collections import defaultdict


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace_gap"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
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
            agg = defaultdict(float)
            cnt = defaultdict(int)
            total = 0.0
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, "?")
                if name.startswith("%while"):
                    continue
                ms = ev.duration_ps / 1e9 / n_steps
                key = re.sub(r"\.\d+", "", name.split(" = ")[0])
                agg[key] += ms
                cnt[key] += 1
                total += ms
            print(f"total {total:.2f} ms/step, {len(agg)} distinct ops")
            for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:60]:
                print(f"  {v:7.3f}  x{cnt[k]//n_steps:<4d} {k}")


if __name__ == "__main__":
    main()
