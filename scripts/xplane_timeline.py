"""Dump a time-ordered window of device-plane events from an xplane trace.

Usage: python scripts/xplane_timeline.py <trace_dir> <t0_ms> <t1_ms>
Times are relative to the earliest device event. Prints [start, dur] name
per line, indented by overlap, for eyeballing what runs concurrently with
the attention kernels.
"""

import glob
import os
import sys


def main():
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    d, t0, t1 = sys.argv[1], float(sys.argv[2]), float(sys.argv[3])
    f = glob.glob(os.path.join(d, "**", "*.xplane.pb"), recursive=True)[0]
    xs = xplane_pb2.XSpace()
    with open(f, "rb") as fh:
        xs.ParseFromString(fh.read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        rows = []
        for line in plane.lines:
            base = line.timestamp_ns
            for ev in line.events:
                start_ms = (base + ev.offset_ps / 1e3) / 1e6
                rows.append((start_ms, ev.duration_ps / 1e9,
                             line.name, ev_meta.get(ev.metadata_id, "?")))
        rows.sort()
        if not rows:
            continue
        t_base = rows[0][0]
        print(f"== plane {plane.name}, {len(rows)} events, "
              f"base {t_base:.3f} ms ==")
        for s, dur, lname, name in rows:
            rel = s - t_base
            if t0 <= rel <= t1:
                print(f"{rel:10.3f} +{dur:8.3f} [{lname[:18]:18s}] {name[:100]}")


if __name__ == "__main__":
    main()
