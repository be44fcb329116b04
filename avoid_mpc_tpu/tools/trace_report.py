"""Summarize device time from a ``jax.profiler.trace`` capture.

The tensorboard-plugin-profile converter in this image is broken (protobuf
descriptor mismatch), so this parses the raw ``*.xplane.pb`` directly and
prints per-op device-time totals for the TPU plane — the attribution tool
for "where does the step's device time go?" (the role nvprof/nsys output
plays for the reference's CUDA-side profiling, and what
``AvoidanceStateMachine.cpp:329-343``'s solve-time print does on CPU).

Usage:
    with jax.profiler.trace("/tmp/jaxtrace"):
        ... run the jitted step a few times ...
    python -m avoid_mpc_tpu.tools.trace_report /tmp/jaxtrace [--top 30]

Notes (hard-won, see CLAUDE.md):
  * must run with pure-python protobuf parsing — this module sets
    ``PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python`` before importing;
  * async ``slice-start``/``copy-start`` events report overlap windows, not
    occupancy — they are excluded from the rollup by default.
"""

from __future__ import annotations

import os

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import argparse
import collections
import glob
import sys


def load_xspaces(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    spaces = []
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        spaces.append(xs)
    return spaces


def device_op_totals(spaces, include_async=False):
    """{op_name: total_ps} summed over every '/device:TPU' plane's events."""
    totals = collections.Counter()
    plane_names = []
    for xs in spaces:
        for plane in xs.planes:
            if "/device:TPU" not in plane.name:
                continue
            plane_names.append(plane.name)
            meta = plane.event_metadata
            for line in plane.lines:
                for ev in line.events:
                    name = meta[ev.metadata_id].name if ev.metadata_id in meta else "?"
                    if not include_async and (
                        "-start" in name or name.startswith("async")
                    ):
                        continue
                    totals[name] += ev.duration_ps
    return totals, plane_names


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--group", action="store_true",
                    help="fold fusion.N / op.N suffixes together")
    args = ap.parse_args(argv)

    spaces = load_xspaces(args.trace_dir)
    if not spaces:
        print("no xplane.pb under", args.trace_dir, file=sys.stderr)
        return 1
    totals, planes = device_op_totals(spaces)
    if args.group:
        grouped = collections.Counter()
        for name, ps in totals.items():
            base = name.rstrip("0123456789").rstrip(".")
            grouped[base] += ps
        totals = grouped

    total_ps = sum(totals.values())
    print(f"planes: {sorted(set(planes))}")
    print(f"total device time: {total_ps / 1e9:.3f} ms")
    width = max((len(n) for n, _ in totals.most_common(args.top)), default=4)
    for name, ps in totals.most_common(args.top):
        print(f"{name:<{width}}  {ps / 1e9:9.3f} ms  {100.0 * ps / total_ps:5.1f}%")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
