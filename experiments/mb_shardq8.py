"""Sharded-q8 in-situ proof at RefSeq per-shard scale (VERDICT r3 #1).

The 528M-k-mer / 8-shard proof classifies on the virtual CPU mesh, where
gather rates say nothing about the TPU. The honest in-situ measurement is
ONE shard's workload on the real chip: a ~66M-k-mer k=21 table (what each
of the 8 shards holds) probed by a full read batch, in the std fused-row
layout (nb = 2^23 rows x 256 B — far beyond the 2^17 fast-row cliff) vs
the q8 layout (2^21 rows x 512 B, half the bytes, quarter the rows).

Explicit layout= overrides are used (exactness-only gate): the AUTO
policy only picks q8 here via the sharded plan — this measures whether
that plan is right.

Output: one JSON line per measurement. Run WITHOUT JAX_PLATFORMS (real
TPU), single process.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))
sys.path.insert(0, "src")

from pangea_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import numpy as np

from pangea_tpu.bench import _batches, _measure
from pangea_tpu.classify.engine import DeviceIndex, make_classify_fn
from pangea_tpu.index import build_index
from pangea_tpu.utils import datagen

BATCH = 16384
READ_LEN = 150
# x 48 species ~= 33M distinct 21-mers: std table 2^23 rows x 256 B =
# 2.1 GB (the 66M/4.3 GB first attempt OOMed the chip in the gather's
# intermediates), q8 2^20 rows x 512 B = 0.5 GB. Both far beyond the
# 2^17 fast-row cliff — representative of a RefSeq shard.
GENOME_BP = 700_000


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    t0 = time.time()
    tax = datagen.make_taxonomy(n_phyla=2, genera_per_phylum=8,
                                species_per_genus=3, seed=31)
    genomes = datagen.make_genomes(tax, genome_len=GENOME_BP, seed=32)
    idx = build_index(genomes, tax, k=21, w=1)
    emit(stage="built", kmers=idx.meta.n_kmers,
         std_buckets=idx.meta.n_buckets,
         build_sec=round(time.time() - t0, 1))
    rs = datagen.sample_reads(genomes, BATCH, read_len=READ_LEN,
                              paired=True, n_prob=0.005, seed=33)
    d1, d2 = _batches(rs, BATCH, READ_LEN)
    outs = {}
    for layout in ("q8", "std"):
        di = DeviceIndex.from_index(idx, confidence_threshold=0.0,
                                    layout=layout)
        fn = make_classify_fn(di.cfg, paired=True)
        f0 = di.fused[0] if not isinstance(di.fused, tuple) else None
        try:
            step, csec, out, _ = _measure(fn, di.tables, d1, d2, rounds=4)
        except Exception as e:        # OOM on the big std table: record
            emit(experiment="refseq_shard_k21", layout=layout,
                 error=repr(e)[:200])
            del di, fn
            continue
        outs[layout] = {k: np.asarray(v) for k, v in out.items()}
        emit(experiment="refseq_shard_k21", layout=layout,
             step_ms=round(step * 1e3, 3),
             reads_per_sec=round(BATCH / step, 1),
             table_rows=int(f0.shape[0]) if f0 is not None else None,
             table_mb=round(f0.nbytes / 1e6, 1) if f0 is not None
             else None,
             compile_sec=round(csec, 1))
        del di, fn
    if "std" in outs and "q8" in outs:
        for k in ("taxon", "best", "nvalid"):
            np.testing.assert_array_equal(outs["std"][k], outs["q8"][k])
        emit(experiment="refseq_shard_k21", parity="std == q8 bit-exact",
             total_sec=round(time.time() - t0, 1))


if __name__ == "__main__":
    main()
