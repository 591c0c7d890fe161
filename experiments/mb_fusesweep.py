"""Chunk-size sweep for the round-5 FUSED read-chunk step (whole pipeline
per chunk), plus fused-vs-unfused A/B, interleaved in one process.

Run: PYTHONPATH=src:/root/.axon_site python experiments/mb_fusesweep.py
"""
import json
import os

from pangea_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from pangea_tpu.bench import make_bench_world
from pangea_tpu.classify.engine import DeviceIndex, make_classify_fn, pad_batch
from pangea_tpu.index import build_index
from pangea_tpu.utils.timing import marginal_time

BATCH = 16384
L = 150

tax, genomes, idx_dense, rs = make_bench_world()
idx = build_index(genomes, tax, k=21, w=8)
b1 = jax.device_put(pad_batch(rs.seqs[:BATCH], BATCH, L))
b2 = jax.device_put(pad_batch(rs.mates[:BATCH], BATCH, L))


def time_step(fuse, chunk):
    os.environ["PANGEA_FUSE_CHUNK"] = "1" if fuse else "0"
    os.environ["PANGEA_Q8_CHUNK"] = str(chunk)
    di = DeviceIndex.from_index(idx, confidence_threshold=0.0)
    fn = make_classify_fn(di.cfg, paired=True)
    tables = di.tables

    def make_loop(n):
        def run(state):
            def body(_, st):
                x, y = st
                o = fn(tables, x, y)
                s = o["best"][0] % jnp.int32(7) + jnp.int32(1)
                return (jnp.roll(x, s, 0), jnp.roll(y, s, 0))
            return jax.lax.fori_loop(0, n, body, state)
        return run

    per, _ = marginal_time(make_loop, (b1, b2), r=8)
    return round(per * 1e3, 3)


CASES = [("fused", True, 8192), ("fused", True, 16384),
         ("fused", True, 32768), ("fused", True, 65536),
         ("unfused", False, 32768)]
out = {}
for rnd in range(3):
    for name, fuse, chunk in CASES:
        key = f"{name}_{chunk}"
        out.setdefault(key, []).append(time_step(fuse, chunk))
        print(rnd, key, out[key][-1], flush=True)
print(json.dumps(out))
with open("docs/artifacts/mb_fusesweep_r05.json", "w") as fh:
    json.dump(out, fh, indent=2)
