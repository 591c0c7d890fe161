"""Minimizer-window sweep (VERDICT r4 #5): speed vs classification quality
across w, on the headline world AND a RefSeq-shard-scale world.

rows/read = P/w is THE throughput denominator (gather ceiling = rows/s /
rows-per-read), and larger w also shrinks deep tables toward the fast
regime — but every windowed probe lost to a read error costs signal. This
measures, per (world, w): build time, index size, device step, and quality
vs planted truth (exact-match %, ancestor-consistency %) on 1%-error
reads, with the w=1 dense classification as the quality reference.

Run: PYTHONPATH=src:/root/.axon_site python experiments/mb_wsweep.py
"""
import json
import time

from pangea_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import numpy as np

from pangea_tpu.bench import _batches, _measure
from pangea_tpu.classify.engine import DeviceIndex, make_classify_fn
from pangea_tpu.index import build_index
from pangea_tpu.utils import datagen

BATCH = 16384
L = 150
results = []


def quality(taxon, truth, tax):
    tin, tout = tax.tin, tax.tout
    t = np.asarray(taxon)
    exact = (t == truth).mean()
    anc = ((tin[t] <= tin[truth]) & (tin[truth] < tout[t]) & (t != 0)) \
        | (t == truth)
    return round(100 * float(exact), 2), round(100 * float(anc.mean()), 2)


def run_world(name, tax, genomes, rs, ws, paired):
    if paired:
        d1, d2 = _batches(rs, BATCH, L)
    else:
        import jax
        from pangea_tpu.classify.engine import pad_batch
        d1 = jax.device_put(pad_batch(rs.seqs[:BATCH], BATCH, L))
        d2 = None
    truth = rs.truth[:BATCH]
    for w in ws:
        t0 = time.time()
        idx = build_index(genomes, tax, k=21, w=w)
        bsec = time.time() - t0
        di = DeviceIndex.from_index(idx, confidence_threshold=0.0)
        fn0 = make_classify_fn(di.cfg, paired=paired)
        # _measure always passes (tables, b1, b2): adapt unpaired fns
        # (b2 = a dummy copy of b1, rolled alongside, ignored).
        fn = fn0 if paired else (lambda tables, b1, b2: fn0(tables, b1))
        step, csec, out, _ = _measure(fn, di.tables, d1,
                                      d2 if paired else d1, rounds=4)
        taxon = np.asarray(out["taxon"])[:BATCH]
        ex, anc = quality(taxon, truth, tax)
        f0 = di.fused if not isinstance(di.fused, tuple) else di.fused[0]
        row = {"world": name, "w": w, "n_kmers": idx.meta.n_kmers,
               "layout": di.cfg.layout,
               "table_mb": round(sum(np.asarray(x).nbytes
                                     for x in (f0 if isinstance(f0, tuple)
                                               else [f0])) / 1e6, 1),
               "build_sec": round(bsec, 1),
               "step_ms": round(step * 1e3, 3),
               "reads_per_sec": round(BATCH / step, 1),
               "compile_sec": round(csec, 1),
               "pct_classified": round(100 * float((taxon != 0).mean()), 2),
               "exact_pct": ex, "anc_pct": anc}
        results.append(row)
        print(json.dumps(row), flush=True)
        del di, fn


# World A: headline-like (bench world genomes), paired, 1% error reads.
from pangea_tpu.bench import make_bench_world
tax_a, genomes_a, _, _ = make_bench_world()
rs_a = datagen.sample_reads(genomes_a, BATCH, read_len=L, paired=True,
                            n_prob=0.01, seed=51)
run_world("headline", tax_a, genomes_a, rs_a, (1, 4, 8, 12, 16),
          paired=True)

# World B: RefSeq-shard scale (the mb_shardq8 world: ~28M k-mers at w=1),
# single-end shotgun, 1% error.
tax_b = datagen.make_taxonomy(n_phyla=2, genera_per_phylum=8,
                              species_per_genus=3, seed=31)
genomes_b = datagen.make_genomes(tax_b, genome_len=700_000, seed=32)
rs_b = datagen.sample_reads(genomes_b, BATCH, read_len=L, paired=False,
                            n_prob=0.01, seed=52)
run_world("refseq_shard", tax_b, genomes_b, rs_b, (1, 4, 8, 16),
          paired=False)

with open("docs/artifacts/wsweep_r05.json", "w") as fh:
    json.dump(results, fh, indent=2)
print("done")
