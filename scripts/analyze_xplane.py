"""Aggregate op self-times from a jax.profiler trace (xplane.pb).

Usage: python scripts/analyze_xplane.py /tmp/geoada_trace/unfused [topN]

Walks every *.xplane.pb under the dir, sums event durations per event name
on the device planes (skips host threads), prints the top-N by total time.
Used to diff fused-vs-unfused geoada step programs op by op.
"""

import glob
import os
import sys
from collections import defaultdict


def load(path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def aggregate(space):
    per_plane = {}
    for plane in space.planes:
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        totals = defaultdict(float)
        counts = defaultdict(int)
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] += ev.duration_ps / 1e9  # -> ms
                counts[name] += 1
        if totals:
            per_plane[plane.name] = (totals, counts)
    return per_plane


def main():
    d = sys.argv[1]
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    files = glob.glob(os.path.join(d, "**", "*.xplane.pb"), recursive=True)
    if not files:
        print(f"no xplane.pb under {d}")
        return
    for f in files:
        space = load(f)
        for pname, (totals, counts) in aggregate(space).items():
            if ("host" in pname.lower() and "TPU" not in pname
                    and "device" not in pname.lower()):
                continue
            total = sum(totals.values())
            print(f"\n== {os.path.basename(f)} :: plane '{pname}' "
                  f"(sum {total:.1f} ms) ==")
            for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:topn]:
                print(f"{ms:10.2f} ms  x{counts[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
