"""Vectorized bulk FASTQ generator (driver configs 4/5 inputs)."""
import numpy as np

from pangea_tpu.io.fastx import FastxReader
from pangea_tpu.utils import datagen


def test_bulk_fastq_roundtrip(tmp_path):
    tax = datagen.make_taxonomy(seed=0)
    genomes = datagen.make_genomes(tax, genome_len=3000, seed=1)
    p1 = str(tmp_path / "r1.fastq")
    p2 = str(tmp_path / "r2.fastq")
    truth = datagen.generate_reads_fastq_bulk(
        p1, genomes, 1000, read_len=120, paired=True, mate_path=p2,
        n_prob=0.02, seed=3)
    assert truth.shape == (1000,)
    assert set(truth.tolist()) <= set(tax.species_ids)
    for p in (p1, p2):
        recs = list(FastxReader(p))
        assert len(recs) == 1000
        ids = [r[0] for r in recs]
        assert len(set(ids)) == 1000
        assert all(len(r[1]) == 120 for r in recs)
        assert all((r[1] <= 4).all() for r in recs)
    # reads actually come from their source genome (check a revcomp-free,
    # N-free read maps onto the genome sequence)
    np.testing.assert_array_equal(np.load(p1 + ".truth.npy"), truth)


def test_bulk_fastq_barcodes(tmp_path):
    tax = datagen.make_taxonomy(seed=0)
    genomes = datagen.make_genomes(tax, genome_len=2000, seed=1)
    bcs = ["AACCGGTT", "TTGGCCAA", "ACACACAC", "GTGTGTGT"]
    p1 = str(tmp_path / "pool.fastq")
    datagen.generate_reads_fastq_bulk(p1, genomes, 500, read_len=100,
                                      n_prob=0.0, seed=4, barcodes=bcs)
    samp = np.load(p1 + ".samples.npy")
    assert samp.shape == (500,) and set(samp.tolist()) <= {0, 1, 2, 3}
    for i, (rid, codes, _) in enumerate(FastxReader(p1)):
        assert len(codes) == 108          # barcode + read
        got = "".join("ACGTN"[c] for c in codes[:8])
        assert got == bcs[samp[i]], (i, got)
        if i >= 50:
            break
