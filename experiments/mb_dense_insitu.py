"""In-situ dense (w=1) layout sweep on the real chip (VERDICT r2 #2): the
REAL classify program — not mb_gather's isolated gather — measured at each
candidate (ways, n_sub) layout of the dense parity index, plus raw-gather
geometry probes run under in-situ-like conditions (same batch tensors
resident, same chained-round timing).

Answers two questions:
1. Which layout actually wins the dense program? (r2's auto policy picked
   W=32/n_sub=2 off microbenchmarks and LOST to r1's W=16/n_sub=1 in situ.)
2. What rows/s does a single gather achieve in situ at each table
   geometry, including the q8-candidate geometry [2^16 rows x 512 B]?

Run: PYTHONPATH=src:/root/.axon_site python experiments/mb_dense_insitu.py
"""
import json

from pangea_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from pangea_tpu.bench import make_bench_world
from pangea_tpu.classify.engine import DeviceIndex, make_classify_fn, pad_batch
from pangea_tpu.index import build_index
from pangea_tpu.utils.timing import marginal_time

BATCH = 16384
L = 150

tax, genomes, idx_dense, rs = make_bench_world()
b1 = jax.device_put(pad_batch(rs.seqs[:BATCH], BATCH, L))
b2 = jax.device_put(pad_batch(rs.mates[:BATCH], BATCH, L))
P = 2 * (L - idx_dense.meta.k + 1)      # paired probe count at w=1
NPROBE = BATCH * P


def measure_layout(ways, n_sub, layout="std"):
    idx = build_index(genomes, tax, k=idx_dense.meta.k, w=1,
                      ways=ways or 16)
    di = DeviceIndex.from_index(idx, confidence_threshold=0.0,
                                n_sub=None if layout == "q8" else n_sub,
                                layout=layout)
    fn = make_classify_fn(di.cfg, paired=True)
    tables = di.tables

    def make_loop(n):
        def run(state):
            def body(_, st):
                x, y = st
                out = fn(tables, x, y)
                s = out["best"][0] % jnp.int32(7) + jnp.int32(1)
                return (jnp.roll(x, s, 0), jnp.roll(y, s, 0))
            return jax.lax.fori_loop(0, n, body, state)
        return run

    per, _ = marginal_time(make_loop, (b1, b2), r=4)
    fshape = (di.fused[0].shape if di.cfg.n_sub > 1 else di.fused.shape)
    print(f"layout={layout} ways={di.cfg.ways:2d} n_sub={di.cfg.n_sub}  "
          f"{per*1e3:8.2f} ms  {BATCH/per:10.0f} reads/s   table/sub "
          f"{fshape} ({np.prod(fshape)*4/1e6:.1f} MB)", flush=True)
    return {"layout": layout, "ways": di.cfg.ways, "n_sub": di.cfg.n_sub,
            "step_ms": round(per * 1e3, 2),
            "reads_per_sec": round(BATCH / per, 0)}


def measure_raw_gather(nrows, rowbytes, n_gathers=1):
    """Raw [NPROBE] row gathers from a [nrows, rowbytes/4] uint32 table,
    chained-round in-situ style. n_gathers back-to-back gathers per round
    (the n_sub analog)."""
    tab = jax.device_put(np.random.default_rng(0).integers(
        0, 2**32, size=(nrows, rowbytes // 4), dtype=np.uint32))
    ridx = jax.device_put(np.random.default_rng(1).integers(
        0, nrows, size=NPROBE).astype(np.int32))

    def make_loop(n):
        def run(state):
            def body(_, s):
                acc = jnp.uint32(0)
                idxs = (ridx + s) % jnp.int32(nrows)
                for g in range(n_gathers):
                    rows = tab[(idxs + jnp.int32(g)) % jnp.int32(nrows)]
                    acc = acc + rows[0, 0] + rows[NPROBE - 1, 0]
                return (acc % jnp.uint32(7)).astype(jnp.int32) + s
            return jax.lax.fori_loop(0, n, body, state)
        return run

    per, _ = marginal_time(make_loop, jnp.int32(0), r=4)
    tot = NPROBE * n_gathers
    print(f"raw gather [{nrows:7d} x {rowbytes:4d}B] x{n_gathers}: "
          f"{per*1e3:8.2f} ms  {tot/per/1e6:7.1f}M rows/s", flush=True)
    return {"rows": nrows, "row_bytes": rowbytes, "n_gathers": n_gathers,
            "ms": round(per * 1e3, 2),
            "mrows_per_sec": round(tot / per / 1e6, 1)}


if __name__ == "__main__":
    out = {"layouts": [], "raw": []}
    print(f"dense sweep: B={BATCH} P={P} -> {NPROBE/1e6:.2f}M probes/step",
          flush=True)
    out["layouts"].append(measure_layout(16, 1, layout="q8"))
    for ways, n_sub in ((16, 1), (32, 2), (32, 1)):
        out["layouts"].append(measure_layout(ways, n_sub))
    # geometry probes: current layouts + the q8 candidate (W=64 8 B slots:
    # 2^16 rows x 512 B for the 2M-kmer dense table) + sanity points
    for nrows, rb, ng in ((262144, 256, 1),   # W=16 n_sub=1 (r1 layout)
                          (131072, 512, 1),   # W=32 n_sub=1
                          (65536, 512, 2),    # W=32 n_sub=2 (r2 auto)
                          (65536, 512, 1),    # q8 candidate geometry
                          (65536, 256, 1),    # half-size sanity
                          (32768, 512, 1)):
        out["raw"].append(measure_raw_gather(nrows, rb, ng))
    with open("/tmp/mb_dense_insitu.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))
