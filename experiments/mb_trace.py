"""Attempt an xprof/perfetto trace of the headline classify step
(VERDICT r3 #5): jax.profiler.start_trace around the steady-state loop.
Under the axon tunnel the device is REMOTE — this probes whether device
(TPU) op-level events are captured at all, or only host-side Python.
Output: docs/artifacts/trace_r04/ + a note on what was captured."""
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))
sys.path.insert(0, "src")

from pangea_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import numpy as np

from pangea_tpu.bench import _batches, make_bench_world
from pangea_tpu.classify.engine import DeviceIndex, make_classify_fn
from pangea_tpu.index import build_index
from pangea_tpu.utils.timing import fetch_sync

OUT = os.path.join(os.path.dirname(__file__), "..", "docs", "artifacts",
                   "trace_r05")


def main():
    tax, genomes, idx_dense, rs = make_bench_world()
    idx = build_index(genomes, tax, k=21, w=8)
    di = DeviceIndex.from_index(idx, confidence_threshold=0.0)
    fn = make_classify_fn(di.cfg, paired=True)
    d1, d2 = _batches(rs, 16384, 150)
    out = fn(di.tables, d1, d2)
    fetch_sync(out)                      # compile outside the trace
    os.makedirs(OUT, exist_ok=True)
    jax.profiler.start_trace(OUT)
    for _ in range(20):
        out = fn(di.tables, d1, d2)
    fetch_sync(out)
    jax.profiler.stop_trace()
    files = [os.path.relpath(p, OUT) for p in
             glob.glob(os.path.join(OUT, "**", "*"), recursive=True)
             if os.path.isfile(p)]
    sizes = {f: os.path.getsize(os.path.join(OUT, f)) for f in files}
    print(json.dumps({"captured_files": sizes}, indent=1))


if __name__ == "__main__":
    main()
