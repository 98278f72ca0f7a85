"""Headless XProf trace summarizer.

``--profile-dir`` on the trainers captures a ``jax.profiler`` trace
(*.xplane.pb). The TensorBoard profile plugin's converter is broken against
this image's TensorFlow, so this tool parses the XSpace proto directly
(``tensorflow.tsl.profiler.protobuf.xplane_pb2``) and prints, per device
plane: the traced wall span, per-line busy fraction (interval union), and
the top ops by accumulated duration — enough to find where MXU time goes
without a TensorBoard UI.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import collections
import glob
import os


def _union_busy(intervals):
    """Total covered time of [start, end) intervals."""
    busy, last_end = 0, None
    for s, e in sorted(intervals):
        if last_end is None or s >= last_end:
            busy += e - s
            last_end = e
        elif e > last_end:
            busy += e - last_end
            last_end = e
    return busy


def summarize_plane(plane, top_k=20):
    stats = plane.stat_metadata
    ev_meta = plane.event_metadata
    by_name = collections.Counter()
    calls = collections.Counter()
    line_busy = {}
    span_lo, span_hi = None, None
    for line in plane.lines:
        iv = []
        for ev in line.events:
            start = line.timestamp_ns + ev.offset_ps // 1000
            dur = ev.duration_ps // 1000  # ns
            name = ev_meta[ev.metadata_id].name if ev.metadata_id in ev_meta else "?"
            by_name[name] += dur
            calls[name] += 1
            iv.append((start, start + dur))
            span_lo = start if span_lo is None else min(span_lo, start)
            span_hi = start + dur if span_hi is None else max(span_hi, start + dur)
        if iv:
            line_busy[line.name or f"line{line.id}"] = _union_busy(iv)
    return {
        "span_ns": (span_hi - span_lo) if span_lo is not None else 0,
        "line_busy_ns": line_busy,
        "top": by_name.most_common(top_k),
        "calls": calls,
        "n_stats": len(stats),
    }


def main():
    parser = argparse.ArgumentParser(description="Summarize an XProf trace.")
    parser.add_argument("trace_dir", help="dir passed to --profile-dir")
    parser.add_argument("--top", type=int, default=20)
    parser.add_argument("--all-planes", action="store_true",
                        help="include host/python planes, not just devices")
    args = parser.parse_args()

    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(
        glob.glob(os.path.join(args.trace_dir, "**", "*.xplane.pb"),
                  recursive=True)
    )
    if not paths:
        raise SystemExit(f"no *.xplane.pb under {args.trace_dir}")
    for path in paths:
        xspace = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xspace.ParseFromString(f.read())
        print(f"== {os.path.relpath(path, args.trace_dir)}")
        for plane in xspace.planes:
            is_device = plane.name.startswith("/device") or "TPU" in plane.name
            if not (is_device or args.all_planes):
                continue
            s = summarize_plane(plane, args.top)
            span_ms = s["span_ns"] / 1e6
            print(f"-- plane: {plane.name}  span {span_ms:.2f} ms")
            for lname, busy in sorted(
                s["line_busy_ns"].items(), key=lambda kv: -kv[1]
            )[:8]:
                frac = busy / s["span_ns"] if s["span_ns"] else 0.0
                print(f"   line {lname:<28} busy {busy / 1e6:9.2f} ms ({frac:5.1%})")
            print(f"   top {args.top} ops by accumulated time:")
            for name, dur in s["top"]:
                print(
                    f"     {dur / 1e6:9.2f} ms x{s['calls'][name]:<6} "
                    f"{name[:90]}"
                )


if __name__ == "__main__":
    main()
