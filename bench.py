#!/usr/bin/env python
"""Driver bench entry: prints ONE JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

vs_baseline = measured / HBM-roofline (speed-of-light fraction) — the
reference published no numbers (BASELINE.md), so the roofline is the
baseline the driver spec sets ("speed-of-light per chip").
Runs on the real TPU chip (does NOT import tests/conftest.py).
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "src"))

from pangea_tpu.bench import run_bench  # noqa: E402

if __name__ == "__main__":
    line = run_bench()
    print(json.dumps(line, sort_keys=True))
