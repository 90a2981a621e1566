"""Summarize a jax.profiler xplane trace: top ops by device self-time.

Usage: python tools/xplane_top.py <trace_dir_or_xplane.pb> [top_k] [--group]

Walks every TPU/device plane in the XSpace dump, aggregates XLA op event
durations per line (each line is an execution stream; op events on the same
line don't overlap, so summing durations per line gives device busy time),
and prints the top-K ops plus a fusion-category rollup. Host/python planes
are skipped.

Pure-python protobuf parsing (PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python
is forced before the tensorflow import) because the baked-in
tensorboard_plugin_profile's compiled converter is incompatible with this
TF build.
"""

from __future__ import annotations

import collections
import glob
import os
import re
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402


def find_xplane(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(
        glob.glob(os.path.join(path, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not hits:
        raise SystemExit(f"no .xplane.pb under {path}")
    return hits[-1]


_CATEGORY_RULES = [
    ("flash_attn", re.compile(r"flash|attn|attention", re.I)),
    ("window_attn", re.compile(r"window", re.I)),
    ("fused_ce", re.compile(r"cross_entropy|softmax_xent|ce_fwd|ce_bwd", re.I)),
    ("decode_attn", re.compile(r"decode_attention|decode_attn", re.I)),
    ("matmul/conv", re.compile(r"^(fusion\.)?(convolution|dot|conv)", re.I)),
    ("copy/transpose", re.compile(r"copy|transpose|bitcast", re.I)),
    ("allreduce/collective", re.compile(r"all-reduce|all-gather|collective", re.I)),
    ("dynamic-update", re.compile(r"dynamic-update|dynamic_update", re.I)),
    ("rng", re.compile(r"rng|threefry|philox", re.I)),
]


def categorize(name: str) -> str:
    for cat, rx in _CATEGORY_RULES:
        if rx.search(name):
            return cat
    if name.startswith("fusion"):
        return "fusion(elementwise/other)"
    return "other"


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    path = args[0] if args else "/tmp/trace"
    top_k = int(args[1]) if len(args) > 1 else 40
    pb = find_xplane(path)
    space = xplane_pb2.XSpace()
    with open(pb, "rb") as f:
        space.ParseFromString(f.read())

    per_op = collections.Counter()          # name -> total ps
    per_op_count = collections.Counter()
    total_ps = 0
    for plane in space.planes:
        lname = plane.name.lower()
        if not ("tpu" in lname or "device" in lname or "/device:" in lname):
            continue
        if "host" in lname and "tpu" not in lname:
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            # ONLY the synchronous execution stream. 'Async XLA Ops' events
            # (DMA copy-start windows) span the compute they overlap with —
            # summing them double-counts and inflates copies (seen: 2.6 s of
            # async windows inside a 0.64 s step stream).
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name
                per_op[name] += ev.duration_ps
                per_op_count[name] += 1
                total_ps += ev.duration_ps

    if not per_op:
        # fall back: dump plane/line names so the caller can adapt
        for plane in space.planes:
            print(f"plane: {plane.name}")
            for line in plane.lines:
                print(f"  line: {line.name} ({len(line.events)} events)")
        raise SystemExit("no device op events matched")

    total_ms = total_ps / 1e9
    print(f"device op time total: {total_ms:.2f} ms  (file {os.path.basename(pb)})")
    print(f"{'ms':>9} {'%':>6} {'count':>6}  op")
    for name, ps in per_op.most_common(top_k):
        print(f"{ps/1e9:9.2f} {100*ps/total_ps:6.2f} {per_op_count[name]:6d}  {name[:110]}")

    cats = collections.Counter()
    for name, ps in per_op.items():
        cats[categorize(name)] += ps
    print("\ncategory rollup:")
    for cat, ps in cats.most_common():
        print(f"{ps/1e9:9.2f} {100*ps/total_ps:6.2f}  {cat}")


if __name__ == "__main__":
    main()
