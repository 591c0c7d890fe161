"""Benchmark harness (SURVEY.md C23, §7).

Measures reads/sec/chip on a driver-config-2-like workload (paired-end
reads, index replicated on one chip) through the real device classify step,
and compares against the HBM-bandwidth roofline of BASELINE.md:

    roofline reads/s/chip = HBM_bytes/s / (kmers_per_read × bytes/lookup)

The reference has NO published numbers (BASELINE.md — empty mount, empty
``published`` block), so ``vs_baseline`` reports measured/roofline: the
fraction of speed-of-light achieved, the honest scalar the driver spec
asks us to maximize ("must run at speed-of-light per chip").

Synthetic inputs are cached under /tmp so repeated runs measure the device,
not datagen.
"""
from __future__ import annotations

import hashlib
import json
import os
import pickle
import time

import numpy as np

# TPU v5e (v5 lite): ~819 GB/s HBM bandwidth per chip.
HBM_BYTES_PER_SEC = {"v5e": 819e9}
# A probe round gathers one 8-way bucket row per array: 8×4 B from each of
# key_hi/key_lo/val = 96 B (SEMANTICS.md §5 v2); nearly all lookups take one
# round, so 96 B/lookup is the honest HBM traffic floor.
BYTES_PER_PROBE = 3 * 4 * 8


def _cache_dir() -> str:
    d = os.environ.get("PANGEA_BENCH_CACHE", "/tmp/pangea_bench_cache")
    os.makedirs(d, exist_ok=True)
    return d


def make_bench_world(n_reads=100_000, read_len=150, paired=True,
                     n_species=48, genome_len=50_000, k=21, seed=0):
    """Config-2-scale synthetic world: ~48-species 16S-style reference,
    100k paired reads. Cached by parameter hash."""
    key = hashlib.sha256(repr((n_reads, read_len, paired, n_species,
                               genome_len, k, seed, 4)).encode()).hexdigest()[:16]
    path = os.path.join(_cache_dir(), f"world_{key}.pkl")
    if os.path.exists(path):
        with open(path, "rb") as fh:
            return pickle.load(fh)
    from .index import build_index
    from .utils import datagen
    per_genus = 3
    genera = max(n_species // per_genus // 2, 1)
    tax = datagen.make_taxonomy(n_phyla=2, genera_per_phylum=genera,
                                species_per_genus=per_genus, seed=seed)
    genomes = datagen.make_genomes(tax, genome_len=genome_len,
                                   seed=seed + 1)
    idx = build_index(genomes, tax, k=k)
    rs = datagen.sample_reads(genomes, n_reads, read_len=read_len,
                              paired=paired, n_prob=0.005, seed=seed + 2)
    world = (tax, genomes, idx, rs)
    with open(path, "wb") as fh:
        pickle.dump(world, fh)
    return world


def _measure(fn, tables, d1, d2, warmup, iters):
    import jax
    import time as _t
    t0 = _t.time()
    out = fn(tables, d1, d2)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    compile_sec = _t.time() - t0
    for _ in range(warmup):
        out = fn(tables, d1, d2)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    t0 = _t.time()
    for _ in range(iters):
        out = fn(tables, d1, d2)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    return (_t.time() - t0) / iters, compile_sec, out


def run_bench(config_path=None, overrides=(), n_reads=100_000,
              batch=8192, read_len=150, warmup=2, iters=8,
              minimizer_w=8) -> dict:
    """Steady-state device throughput benchmark. Returns the driver's
    one-line JSON dict. Measures the dense (w=1, parity config) path as
    the headline and the minimizer (w>1, production config) path as a
    secondary number."""
    import jax

    from .classify.engine import DeviceIndex, make_classify_fn, pad_batch
    from .index import build_index

    tax, genomes, idx, rs = make_bench_world(n_reads=n_reads,
                                             read_len=read_len)
    di = DeviceIndex.from_index(idx, confidence_threshold=0.0)
    fn = make_classify_fn(di.cfg, paired=True)

    b1 = pad_batch(rs.seqs[:batch], batch, read_len)
    b2 = pad_batch(rs.mates[:batch], batch, read_len)
    d1 = jax.device_put(b1)
    d2 = jax.device_put(b2)

    step, compile_sec, out = _measure(fn, di.tables, d1, d2, warmup, iters)
    reads_per_sec = batch / step

    # Minimizer production config (SEMANTICS.md §3): same genomes/reads.
    min_detail = {}
    if minimizer_w and minimizer_w > 1:
        idx_m = build_index(genomes, tax, k=idx.meta.k, w=minimizer_w)
        di_m = DeviceIndex.from_index(idx_m, confidence_threshold=0.0)
        fn_m = make_classify_fn(di_m.cfg, paired=True)
        step_m, _, out_m = _measure(fn_m, di_m.tables, d1, d2,
                                    warmup, iters)
        taxa_m = np.asarray(out_m["taxon"])
        truth = rs.truth[:batch]
        ok_m = ((taxa_m == truth)
                | tax.is_ancestor_or_self(np.abs(taxa_m), truth)).mean()
        min_detail = {
            "minimizer_w": minimizer_w,
            "minimizer_reads_per_sec": round(batch / step_m, 1),
            "minimizer_step_ms": round(step_m * 1e3, 3),
            "minimizer_ancestor_consistency": round(float(ok_m), 4),
            "minimizer_index": repr(idx_m),
        }

    # Sanity: classification quality on this batch (not part of the metric).
    taxa = np.asarray(out["taxon"])
    truth = rs.truth[:batch]
    ok = ((taxa == truth)
          | tax.is_ancestor_or_self(np.abs(taxa), truth)).mean()

    k = idx.meta.k
    kmers_per_read = 2 * (read_len - k + 1)  # paired
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    bw = HBM_BYTES_PER_SEC.get(gen, 819e9)
    roofline = bw / (kmers_per_read * BYTES_PER_PROBE)

    return {
        "metric": "reads/sec/chip (paired-end 16S classify, config-2-like)",
        "value": round(reads_per_sec, 1),
        "unit": "reads/s/chip",
        "vs_baseline": round(reads_per_sec / roofline, 4),
        "detail": {
            "batch": batch, "read_len": read_len, "k": k,
            "step_ms": round(step * 1e3, 3),
            "compile_sec": round(compile_sec, 1),
            "roofline_reads_per_sec": round(roofline, 1),
            "ancestor_consistency": round(float(ok), 4),
            "index": repr(idx),
            "device": str(jax.devices()[0]),
            **min_detail,
        },
    }
