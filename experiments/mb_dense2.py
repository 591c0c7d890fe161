"""Dense (w=1) q8 follow-up (round 3): where do the q8 step's non-gather
25.5 − 7.9 ≈ 17 ms go, and does a narrower q8 row (W=32, 256 B) or a
wider std row (W=64, 1 KB) do better? Also re-samples raw-gather points
the new row-count-cliff model needs.

Run: PYTHONPATH=src:/root/.axon_site python experiments/mb_dense2.py
"""
import json
import os

from pangea_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from pangea_tpu.bench import make_bench_world
from pangea_tpu.classify.engine import DeviceIndex, make_classify_fn, pad_batch
from pangea_tpu.index import build_index
from pangea_tpu.kernels import extract_kmers_jnp, lookup_q8_jnp
from pangea_tpu.utils.timing import marginal_time

BATCH = 16384
L = 150

tax, genomes, idx_dense, rs = make_bench_world()
b1 = jax.device_put(pad_batch(rs.seqs[:BATCH], BATCH, L))
b2 = jax.device_put(pad_batch(rs.mates[:BATCH], BATCH, L))
K = idx_dense.meta.k
P = 2 * (L - K + 1)
NPROBE = BATCH * P
out = {"layouts": [], "phases": {}, "raw": []}


def measure_layout(label, layout, ways_env=None, build_ways=16):
    if ways_env:
        os.environ["PANGEA_Q8_WAYS"] = str(ways_env)
    else:
        os.environ.pop("PANGEA_Q8_WAYS", None)
    idx = build_index(genomes, tax, k=K, w=1, ways=build_ways)
    di = DeviceIndex.from_index(idx, confidence_threshold=0.0,
                                layout=layout, n_sub=1)
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

    per, _ = marginal_time(make_loop, (b1, b2), r=4)
    print(f"{label:24s} {per*1e3:8.2f} ms  {BATCH/per:10.0f} reads/s  "
          f"fused {di.fused.shape}", flush=True)
    out["layouts"].append({"label": label, "step_ms": round(per * 1e3, 2),
                           "reads_per_sec": round(BATCH / per, 0)})
    return di


def phases_q8(di):
    """extract | extract+lookup | full — q8 dense program."""
    cfg = di.cfg
    tables = di.tables

    def extract_pair(x, y):
        hs, ls, vs = [], [], []
        for bb in (x, y):
            hi, lo, valid = extract_kmers_jnp(bb, cfg.k)
            hs.append(hi)
            ls.append(lo)
            vs.append(valid)
        return (jnp.concatenate(hs, 1), jnp.concatenate(ls, 1),
                jnp.concatenate(vs, 1))

    def t(name, step):
        def make_loop(n):
            def run(state):
                def body(_, st):
                    return step(st)
                return jax.lax.fori_loop(0, n, body, state)
            return run
        per, _ = marginal_time(make_loop, (b1, b2), r=4)
        print(f"  {name:22s} {per*1e3:8.2f} ms", flush=True)
        out["phases"][name] = round(per * 1e3, 2)
        return per

    def s_extract(st):
        x, y = st
        hi, lo, valid = extract_pair(x, y)
        s = (hi[0, 0] % jnp.uint32(7)).astype(jnp.int32) + 1
        return (jnp.roll(x, s, 0), jnp.roll(y, s, 0))

    def s_lookup(st):
        x, y = st
        hi, lo, valid = extract_pair(x, y)
        h, ti, to = lookup_q8_jnp(hi, lo, valid, tables["fused"][0],
                                  tables["stash"][0], k=cfg.k,
                                  ways=cfg.ways)
        s = (h[0, 0] + ti[0, 1]) % jnp.int32(7) + 1
        return (jnp.roll(x, s, 0), jnp.roll(y, s, 0))

    fn = make_classify_fn(cfg, paired=True)

    def s_full(st):
        x, y = st
        o = fn(tables, x, y)
        s = o["best"][0] % jnp.int32(7) + 1
        return (jnp.roll(x, s, 0), jnp.roll(y, s, 0))

    t("extract", s_extract)
    t("extract+lookup", s_lookup)
    t("full", s_full)


def measure_raw(nrows, rowbytes):
    tab = jax.device_put(np.random.default_rng(0).integers(
        0, 2**32, size=(nrows, rowbytes // 4), dtype=np.uint32))
    ridx = jax.device_put(np.random.default_rng(1).integers(
        0, nrows, size=NPROBE).astype(np.int32))

    def make_loop(n):
        def run(state):
            def body(_, s):
                rows = tab[(ridx + s) % jnp.int32(nrows)]
                return (rows[0, 0] + rows[NPROBE - 1, 0]
                        ).astype(jnp.int32) % jnp.int32(7) + s
            return jax.lax.fori_loop(0, n, body, state)
        return run

    per, _ = marginal_time(make_loop, jnp.int32(0), r=4)
    print(f"raw [{nrows:7d} x {rowbytes:4d}B]: {per*1e3:8.2f} ms "
          f"{NPROBE/per/1e6:7.1f}M rows/s", flush=True)
    out["raw"].append({"rows": nrows, "row_bytes": rowbytes,
                      "ms": round(per * 1e3, 2),
                       "mrows_per_sec": round(NPROBE / per / 1e6, 1)})


if __name__ == "__main__":
    di64 = measure_layout("q8 W=64 (512B)", "q8")
    measure_layout("q8 W=32 (256B)", "q8", ways_env=32)
    measure_layout("std W=64 (1KB)", "std", build_ways=64)
    print("phases of q8 W=64:", flush=True)
    phases_q8(di64)
    for nrows, rb in ((131072, 256), (32768, 256), (262144, 512)):
        measure_raw(nrows, rb)
    with open("/tmp/mb_dense2.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))
