"""Native C++ ingest parity vs the numpy reference reader (SURVEY.md C1/C2).

Byte-identical contract: ids, base codes (SEMANTICS.md §1), lengths, and
phred quals must match `pangea_tpu.io.fastx` on plain and gzipped
FASTA/FASTQ, including N runs, lowercase, U→T, long-read truncation, and
final records without trailing newline.
"""
import gzip
import os

import numpy as np
import pytest

from pangea_tpu.io import read_batches
from pangea_tpu.io.native import native_available, read_batches_native

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native io lib not built")


def _write(path, text, gz=False):
    data = text.encode()
    if gz:
        with gzip.open(path, "wb") as fh:
            fh.write(data)
    else:
        with open(path, "wb") as fh:
            fh.write(data)
    return path


FASTQ = """@r1 some comment
ACGTNacgtu
+
IIIIIIIIII
@r2/1
TTTTGGGGCCCCAAAA
+
0123456789ABCDEF
@r3
NNNN
+
!!!!
"""

FASTA = """>g1 desc words
ACGTACGTACGT
ACGTNNNN
>g2
tttt
>g3_final_no_newline
ACGT"""


def _compare(path, max_len, mate=None):
    nat = list(read_batches_native(path, 2, max_len, mate_path=mate))
    ref = list(read_batches(path, 2, mate_path=mate))
    assert len(nat) == len(ref)
    for bn, br in zip(nat, ref):
        assert bn.ids == br.ids
        for sn, sr in zip(bn.seqs, br.seqs):
            np.testing.assert_array_equal(sn, sr[:max_len])
        if br.quals is not None:
            assert bn.quals is not None
            for qn, qr in zip(bn.quals, br.quals):
                np.testing.assert_array_equal(qn, qr[:max_len])
        if br.mate_seqs is not None:
            for sn, sr in zip(bn.mate_seqs, br.mate_seqs):
                np.testing.assert_array_equal(sn, sr[:max_len])
        # padded matrix must equal pad_batch of the (truncated) seqs
        from pangea_tpu.classify.engine import pad_batch
        want = pad_batch(br.seqs, bn.padded.shape[0], max_len)
        got = bn.padded.copy()
        got[len(bn.ids):] = 4  # unused rows are undefined; normalize
        np.testing.assert_array_equal(got[:len(bn.ids)],
                                      want[:len(bn.ids)])


def test_fastq_plain(tmp_path):
    _compare(_write(str(tmp_path / "a.fastq"), FASTQ), 12)


def test_fastq_gz(tmp_path):
    _compare(_write(str(tmp_path / "a.fastq.gz"), FASTQ, gz=True), 12)


def test_fasta_plain(tmp_path):
    _compare(_write(str(tmp_path / "a.fasta"), FASTA), 16)


def test_fasta_gz(tmp_path):
    _compare(_write(str(tmp_path / "a.fasta.gz"), FASTA, gz=True), 16)


def test_truncation(tmp_path):
    _compare(_write(str(tmp_path / "a.fastq"), FASTQ), 4)


def test_paired(tmp_path):
    p1 = _write(str(tmp_path / "r1.fastq"), FASTQ)
    p2 = _write(str(tmp_path / "r2.fastq"), FASTQ)
    _compare(p1, 12, mate=p2)


def test_large_roundtrip(tmp_path):
    # Many records crossing the 1 MiB chunk boundary; compare vs reference.
    rng = np.random.default_rng(0)
    recs = []
    for i in range(5000):
        L = int(rng.integers(50, 400))
        seq = "".join("ACGTN"[c] for c in rng.integers(0, 5, size=L))
        recs.append(f"@read{i}\n{seq}\n+\n{'I' * L}\n")
    path = _write(str(tmp_path / "big.fastq"), "".join(recs))
    nat = list(read_batches_native(path, 512, 300))
    ref = list(read_batches(path, 512))
    assert sum(len(b.ids) for b in nat) == 5000
    for bn, br in zip(nat, ref):
        assert bn.ids == br.ids
        for sn, sr in zip(bn.seqs, br.seqs):
            np.testing.assert_array_equal(sn, sr[:300])


def test_malformed_raises(tmp_path):
    path = _write(str(tmp_path / "bad.fastq"), "@r1\nACGT\n+\nII\n")
    with pytest.raises(ValueError):
        list(read_batches_native(path, 4, 10))
