#!/usr/bin/env python
"""Aggregate device-op durations from a jax.profiler xplane.pb trace.

Usage: python tools/xplane_summary.py /tmp/jaxtrace [top_n]

Prints, per device plane, total busy time and the top-N ops by summed
duration (with occurrence counts) — the TPU answer to nsight/rocprof op
tables, built on the public XSpace schema (tools/xplane/xplane.proto).
"""

import collections
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "xplane"))


def load_xspace(path):
    import xplane_pb2

    # accept a directory (find newest xplane.pb under it) or a file
    if os.path.isdir(path):
        cands = []
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f.endswith(".xplane.pb"):
                    cands.append(os.path.join(root, f))
        assert cands, f"no .xplane.pb under {path}"
        path = max(cands, key=os.path.getmtime)
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs, path


def summarize(xs, top_n=40, plane_filter=("TPU", "tpu", "axon", "/device")):
    out = []
    for plane in xs.planes:
        if plane_filter and not any(p in plane.name for p in plane_filter):
            continue
        meta = plane.event_metadata
        per_op = collections.Counter()
        per_op_n = collections.Counter()
        t_min, t_max = None, 0
        for line in plane.lines:
            for ev in line.events:
                name = meta[ev.metadata_id].name if ev.metadata_id in meta else str(ev.metadata_id)
                per_op[name] += ev.duration_ps
                per_op_n[name] += 1
                start = line.timestamp_ns * 1000 + ev.offset_ps
                end = start + ev.duration_ps
                t_min = end if t_min is None else min(t_min, start)
                t_max = max(t_max, end)
        if not per_op:
            continue
        out.append((plane.name, per_op, per_op_n, t_min, t_max))
    return out


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    xs, used = load_xspace(path)
    print(f"# {used}")
    for name, per_op, per_op_n, t_min, t_max in summarize(xs, top_n):
        total_ms = sum(per_op.values()) / 1e9
        span_ms = (t_max - t_min) / 1e9 if t_min is not None else 0
        print(f"\n== plane: {name}  busy {total_ms:.2f} ms over span "
              f"{span_ms:.2f} ms ==")
        for op, ps in per_op.most_common(top_n):
            print(f"  {ps/1e9:10.3f} ms  x{per_op_n[op]:<6d} {op[:110]}")


if __name__ == "__main__":
    main()
