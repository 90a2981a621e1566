"""Driver-facing contract of ``bench.py``.

The round driver runs ``python bench.py`` under a wall-clock budget and
parses the LAST stdout line as the round's perf record (BENCH_r*.json).
Round 3 lost every measured number when that contract was an
everything-at-exit print (VERDICT.md "What's weak" #1); bench.py now
re-emits the cumulative JSON after every mode. This test pins the
guarantees the driver depends on, on the CPU smoke path:

- exit code 0 and at least one stdout line that parses as JSON with the
  ``{metric, value, unit, vs_baseline, extra}`` shape;
- the last line is the fullest record (train results present);
- an exhausted ``BENCH_BUDGET_S`` skips the remaining modes and records
  them in ``extra.skipped_modes`` — in the last line.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_last_stdout_line_is_full_record_and_budget_skips():
    env = os.environ.copy()
    env["JAX_PLATFORMS"] = "cpu"
    # force the budget break on the second mode: mode 0 always runs,
    # mode 1+ only if elapsed <= budget (bench.py main loop)
    env["BENCH_BUDGET_S"] = "0"
    env.pop("XLA_FLAGS", None)  # single CPU device is fine for smoke mode
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "train,decode"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.strip()]
    assert lines, f"no stdout lines; stderr tail: {out.stderr[-2000:]}"

    rec = json.loads(lines[-1])  # THE contract: the last line always parses
    for key in ("metric", "value", "unit", "vs_baseline", "extra"):
        assert key in rec, f"missing {key!r} in {sorted(rec)}"
    assert rec["value"] > 0.0
    assert rec["unit"] == "samples/sec/chip"

    extra = rec["extra"]
    assert extra["train_step_ms"] > 0.0  # mode 0 ran and was recorded
    assert extra["skipped_modes"] == ["decode"]  # budget break recorded
    assert extra["budget_s"] == 0.0

    # every earlier emitted line parses too (incremental re-emission)
    for ln in lines:
        json.loads(ln)
