import gzip

import numpy as np
import pytest

from pangea_tpu.io import (DemuxConfig, TrimConfig, demux_batch,
                           read_batches, sniff_format, trim_batch)
from pangea_tpu.io.fastx import FastxReader, ReadBatch
from pangea_tpu.utils import datagen


def _write(tmp_path, name, text, gz=False):
    p = tmp_path / name
    if gz:
        with gzip.open(p, "wt") as fh:
            fh.write(text)
    else:
        p.write_text(text)
    return str(p)


FASTA = ">seq1 desc here\nACGT\nACGT\n>seq2\nNNTT\n"
FASTQ = "@r1\nACGTN\n+\nIIIII\n@r2/1\nTTTT\n+anything\n!!!!\n"


def test_fasta_parse(tmp_path):
    recs = list(FastxReader(_write(tmp_path, "a.fasta", FASTA)))
    assert [r[0] for r in recs] == ["seq1", "seq2"]
    np.testing.assert_array_equal(recs[0][1], [0, 1, 2, 3, 0, 1, 2, 3])
    np.testing.assert_array_equal(recs[1][1], [4, 4, 3, 3])
    assert recs[0][2] is None


def test_fastq_parse_and_gzip(tmp_path):
    for gz in (False, True):
        p = _write(tmp_path, f"a{gz}.fastq", FASTQ, gz=gz)
        assert sniff_format(p) == "fastq"
        recs = list(FastxReader(p))
        assert recs[0][0] == "r1"
        np.testing.assert_array_equal(recs[0][1], [0, 1, 2, 3, 4])
        np.testing.assert_array_equal(recs[0][2], [40] * 5)
        np.testing.assert_array_equal(recs[1][2], [0] * 4)


def test_fastq_malformed(tmp_path):
    p = _write(tmp_path, "bad.fastq", "@r1\nACGT\n+\nII\n")
    with pytest.raises(ValueError, match="malformed"):
        list(FastxReader(p))


def test_read_batches_paired(tmp_path):
    p1 = _write(tmp_path, "r1.fastq",
                "".join(f"@x{i}/1\nACGT\n+\nIIII\n" for i in range(5)))
    p2 = _write(tmp_path, "r2.fastq",
                "".join(f"@x{i}/2\nTTTT\n+\nIIII\n" for i in range(5)))
    batches = list(read_batches(p1, 2, mate_path=p2, sample="s"))
    assert [len(b) for b in batches] == [2, 2, 1]
    assert batches[0].ids == ["x0", "x1"]
    assert batches[0].mate_seqs is not None
    np.testing.assert_array_equal(batches[0].mate_seqs[0], [3, 3, 3, 3])


def test_read_batches_paired_mismatch(tmp_path):
    p1 = _write(tmp_path, "r1.fastq", "@a\nAC\n+\nII\n@b\nAC\n+\nII\n")
    p2 = _write(tmp_path, "r2.fastq", "@a\nAC\n+\nII\n")
    with pytest.raises(ValueError, match="fewer records"):
        list(read_batches(p1, 10, mate_path=p2))


def test_trim_quality_and_length():
    seq = np.array([0, 1, 2, 3] * 5, np.uint8)
    qual = np.array([30] * 12 + [2] * 8, np.uint8)
    b = ReadBatch(ids=["r"], seqs=[seq], quals=[qual])
    # windows anchored at i: first mean(qual[i:i+4]) < 20 is i=10
    # (30,30,2,2 → 16), so the read is cut to 10 bases.
    out = trim_batch(b, TrimConfig(min_qual=20, window=4, min_len=5))
    assert out.seqs[0].size == 10
    out2 = trim_batch(b, TrimConfig(min_qual=20, window=4, min_len=15))
    assert len(out2) == 0


def test_trim_fasta_passthrough():
    seq = np.array([0, 1, 2, 3], np.uint8)
    b = ReadBatch(ids=["r"], seqs=[seq], quals=None)
    out = trim_batch(b, TrimConfig(min_qual=20, window=2))
    np.testing.assert_array_equal(out.seqs[0], seq)


def test_demux():
    bc_a = datagen.codes_to_str(np.array([0, 0, 1, 1], np.uint8))  # AACC
    bc_b = "GGTT"
    reads = [np.concatenate([np.array([0, 0, 1, 1], np.uint8),
                             np.array([2, 2], np.uint8)]),
             np.concatenate([np.array([2, 2, 3, 3], np.uint8),
                             np.array([0, 0], np.uint8)]),
             np.array([3, 3, 3, 3, 3], np.uint8)]
    b = ReadBatch(ids=["a", "b", "u"], seqs=reads)
    out = demux_batch(b, DemuxConfig(barcodes=(("sA", bc_a), ("sB", bc_b))))
    assert set(out) == {"sA", "sB", "undetermined"}
    np.testing.assert_array_equal(out["sA"].seqs[0], [2, 2])  # stripped
    np.testing.assert_array_equal(out["sB"].seqs[0], [0, 0])
    assert out["undetermined"].ids == ["u"]
    # 1-mismatch tolerance
    out2 = demux_batch(
        ReadBatch(ids=["m"], seqs=[np.array([0, 1, 1, 1, 2], np.uint8)]),
        DemuxConfig(barcodes=(("sA", bc_a),), max_mismatch=1))
    assert out2["sA"].ids == ["m"]
