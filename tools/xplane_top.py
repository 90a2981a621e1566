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


# The event name is the full HLO snippet: "%var = shape opcode(operands...)".
# Categorize by the OPCODE (the token right before the operand parens), not by
# substring over the whole name — jax auto-names Pallas custom-calls after the
# traced python function (e.g. %transpose_jvp___ = the fused-CE backward), so a
# name-substring match files kernels under copy/transpose.
# opcode = first "<space>token(" after a shape-closing '}' or ')' — tuple
# shapes contain nested parens (tiling annotations like T(8,128)(2,1)) so a
# balanced-paren match is impractical; layout text never has " token(" inside.
_OPCODE_RX = re.compile(r"[})]\s+([a-z][\w-]*)\(")

_KERNEL_RULES = [  # custom-call kernels, matched on the variable name
    ("pallas:window_attn", re.compile(r"%attn", re.I)),
    ("pallas:flash_attn", re.compile(r"flash", re.I)),
    ("pallas:fused_ce", re.compile(r"ce_fwd|ce_bwd|cross_entropy|jvp|xent", re.I)),
    ("pallas:decode_attn", re.compile(r"decode", re.I)),
]

_OPCODE_CATS = {
    "copy": "copy/transpose",
    "transpose": "copy/transpose",
    "bitcast": "copy/transpose",
    "reshape": "copy/transpose",
    "convolution": "matmul/conv",
    "dot": "matmul/conv",
    "all-reduce": "collective",
    "all-gather": "collective",
    "reduce-scatter": "collective",
    "dynamic-update-slice": "dynamic-update",
    "rng-bit-generator": "rng",
}


def categorize(name: str) -> str:
    m = _OPCODE_RX.search(name)
    opcode = m.group(1) if m else ""
    if opcode == "custom-call":
        for cat, rx in _KERNEL_RULES:
            if rx.search(name.split("=")[0]):
                return cat
        return "custom-call(other)"
    if opcode in _OPCODE_CATS:
        return _OPCODE_CATS[opcode]
    if opcode == "fusion" or name.startswith("%fusion"):
        # a fusion's cost driver isn't recoverable from the name alone;
        # split out ones whose ROOT is a conv/dot by the variable name hint
        head = name.split("=")[0]
        if re.search(r"conv|dot|matmul", head, re.I):
            return "fusion(matmul/conv)"
        if re.search(r"transpose|copy", head, re.I):
            return "fusion(transpose-root)"
        return "fusion(elementwise/other)"
    return opcode or "other"


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
