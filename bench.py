#!/usr/bin/env python
"""Driver bench entry: prints ONE JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Robustness contract (VERDICT r2 #1 — round 2's driver run timed out and
recorded nothing):
- the persistent XLA compile cache is enabled up front (first compile of
  the classify program is ~3 min on the tunnel; cached reruns are seconds);
- the headline JSON line is printed and flushed the moment the w=8
  measurement + golden parity finish — optional extras can NEVER cost it;
- extras (dense parity config) run only if wall-clock budget remains
  (PANGEA_BENCH_BUDGET_SEC, default 420 s total) and write to stderr + a
  side file (PANGEA_BENCH_EXTRAS_OUT, default /tmp/pangea_bench_extras.json).

vs_baseline = measured / HBM-roofline (speed-of-light fraction) — the
reference published no numbers (BASELINE.md), so the roofline is the
baseline the driver spec sets ("speed-of-light per chip").
Runs on the real TPU chip (does NOT import tests/conftest.py).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "src"))

from pangea_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

from pangea_tpu.bench import run_bench, run_bench_extras  # noqa: E402

if __name__ == "__main__":
    t0 = time.time()
    budget = float(os.environ.get("PANGEA_BENCH_BUDGET_SEC", "420"))
    line = run_bench()
    print(json.dumps(line, sort_keys=True), flush=True)

    left = budget - (time.time() - t0)
    if left > 90:
        try:
            extras = run_bench_extras(budget_left=left)
            out_path = os.environ.get("PANGEA_BENCH_EXTRAS_OUT",
                                      "/tmp/pangea_bench_extras.json")
            with open(out_path, "w") as fh:
                json.dump(extras, fh, indent=2, sort_keys=True)
            print("extras: " + json.dumps(extras, sort_keys=True),
                  file=sys.stderr, flush=True)
        except Exception as e:  # extras must never fail the bench
            print(f"extras failed: {e!r}", file=sys.stderr)
    else:
        print(f"extras skipped: {left:.0f}s budget left", file=sys.stderr)
