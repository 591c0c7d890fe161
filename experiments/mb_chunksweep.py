"""Chunk-size sweep for the chunked-gather lookup (r4): headline config,
PANGEA_Q8_CHUNK in {16384, 32768, 65536, 131072, 262144}."""
import json, os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))
sys.path.insert(0, "src")
from pangea_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import numpy as np
from pangea_tpu.bench import _batches, _measure, make_bench_world
from pangea_tpu.classify.engine import DeviceIndex, make_classify_fn
from pangea_tpu.index import build_index

tax, genomes, _d, rs = make_bench_world()
idx = build_index(genomes, tax, k=21, w=8)
di = DeviceIndex.from_index(idx, confidence_threshold=0.0, layout="q8")
d1, d2 = _batches(rs, 16384, 150)
want = None
for c in (16384, 32768, 65536, 131072, 262144, 10**9):
    os.environ["PANGEA_Q8_CHUNK"] = str(c)
    fn = make_classify_fn(di.cfg, paired=True)
    step, csec, out, _ = _measure(fn, di.tables, d1, d2, rounds=8)
    got = {k: np.asarray(v) for k, v in out.items()}
    if want is None:
        want = got
    else:
        for k in ("taxon", "best", "nvalid"):
            np.testing.assert_array_equal(got[k], want[k])
    print(json.dumps({"chunk": c, "step_ms": round(step * 1e3, 3),
                      "reads_per_sec": round(16384 / step, 1),
                      "compile_sec": round(csec, 1)}), flush=True)
