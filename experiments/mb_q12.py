"""q12 vs std for k=31, in situ on the real chip (VERDICT r3 #3).

Two regimes + the fused multi-k program:

1. config-4 shape: w=8 minimizer k=31 index (~444k k-mers) — both
   layouts sit inside the fast row regime, so this measures whether
   q12's 512 B / 128-lane rows cost more VPU work than std's 256 B /
   64-lane rows when the gather itself is equally fast.
2. RefSeq-per-shard shape: w=1 k=31 index at ~20M k-mers — std needs
   2^22 rows (beyond the 2^17 fast-row cliff), q12 2^21: the regime the
   layout was built for.
3. config-4 fused multi-k (k=21 q8 + k=31 {std|q12}) — the program the
   driver actually runs.

Output: one JSON line per measurement. Run WITHOUT JAX_PLATFORMS so the
real TPU is used; single process (the tunnel is single-tenant).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))
sys.path.insert(0, "src")

from pangea_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import numpy as np

from pangea_tpu.bench import _batches, _measure, make_bench_world
from pangea_tpu.classify.engine import DeviceIndex, make_classify_fn
from pangea_tpu.index import build_index
from pangea_tpu.utils import datagen

BATCH = 16384
READ_LEN = 150


def emit(**kw):
    print(json.dumps(kw), flush=True)


def measure_single(idx, layout, rs, w):
    di = DeviceIndex.from_index(idx, confidence_threshold=0.0,
                                layout=layout)
    fn = make_classify_fn(di.cfg, paired=True)
    d1, d2 = _batches(rs, BATCH, READ_LEN)
    step, compile_sec, out, _ = _measure(fn, di.tables, d1, d2, rounds=4)
    return step, compile_sec, {k: np.asarray(v) for k, v in out.items()}


def main():
    t0 = time.time()
    tax, genomes, idx_dense, rs = make_bench_world()

    # --- regime 1: config-4 shape, k=31 w=8 ------------------------------
    idx31 = build_index(genomes, tax, k=31, w=8)
    outs = {}
    for layout in ("std", "q12"):
        step, csec, out = measure_single(idx31, layout, rs, 8)
        outs[layout] = out
        emit(experiment="c4shape_k31", layout=layout,
             step_ms=round(step * 1e3, 3),
             reads_per_sec=round(BATCH / step, 1),
             kmers=idx31.meta.n_kmers, compile_sec=round(csec, 1))
    for k in ("taxon", "best", "nvalid"):
        np.testing.assert_array_equal(outs["std"][k], outs["q12"][k])
    emit(experiment="c4shape_k31", parity="std == q12 bit-exact")

    # --- regime 3: fused multi-k at the config-4 shape -------------------
    from jax.sharding import Mesh
    from pangea_tpu.dist.mesh import (batch_sharding,
                                      make_multik_sharded_classify_fn)
    from pangea_tpu.dist import MeshConfig, make_mesh
    idx21 = build_index(genomes, tax, k=21, w=8)
    mesh = make_mesh(MeshConfig(1, 1), devices=jax.devices()[:1])
    di21 = DeviceIndex.from_index(idx21, confidence_threshold=0.0)
    assert di21.cfg.layout == "q8"
    d1, d2 = _batches(rs, BATCH, READ_LEN)
    bsh = batch_sharding(mesh)
    d1 = jax.device_put(np.asarray(d1), bsh)
    d2 = jax.device_put(np.asarray(d2), bsh)
    mk_outs = {}
    for layout in ("std", "q12"):
        di31 = DeviceIndex.from_index(idx31, confidence_threshold=0.0,
                                      layout=layout)
        fn = make_multik_sharded_classify_fn([di21.cfg, di31.cfg], mesh,
                                             paired=True)
        tabs = (di21.tables, di31.tables)
        step, csec, out, _ = _measure(fn, tabs, d1, d2, rounds=4)
        mk_outs[layout] = {k: np.asarray(v) for k, v in out.items()}
        emit(experiment="c4_fused_multik", k31_layout=layout,
             step_ms=round(step * 1e3, 3),
             reads_per_sec=round(BATCH / step, 1),
             compile_sec=round(csec, 1))
    for k in ("taxon", "best", "nvalid"):
        np.testing.assert_array_equal(mk_outs["std"][k], mk_outs["q12"][k])
    emit(experiment="c4_fused_multik", parity="std == q12 bit-exact")

    # --- regime 2: RefSeq-per-shard shape, k=31 w=1, ~20M k-mers ---------
    tax2 = datagen.make_taxonomy(n_phyla=2, genera_per_phylum=8,
                                 species_per_genus=3, seed=7)
    genomes2 = datagen.make_genomes(tax2, genome_len=420_000, seed=8)
    idx31b = build_index(genomes2, tax2, k=31, w=1)
    rs2 = datagen.sample_reads(genomes2, BATCH, read_len=READ_LEN,
                               paired=True, n_prob=0.005, seed=9)
    big = {}
    for layout in ("std", "q12"):
        step, csec, out = measure_single(idx31b, layout, rs2, 1)
        big[layout] = out
        emit(experiment="refseq_shard_k31", layout=layout,
             step_ms=round(step * 1e3, 3),
             reads_per_sec=round(BATCH / step, 1),
             kmers=idx31b.meta.n_kmers, compile_sec=round(csec, 1))
    for k in ("taxon", "best", "nvalid"):
        np.testing.assert_array_equal(big["std"][k], big["q12"][k])
    emit(experiment="refseq_shard_k31", parity="std == q12 bit-exact",
         total_sec=round(time.time() - t0, 1))


if __name__ == "__main__":
    main()
