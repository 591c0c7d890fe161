"""Long-read handling (VERDICT r1 #7): reads longer than max_read_len must
classify EXACTLY (power-of-two length buckets in the general path) through
the public CLI, and any remaining truncation must be counted and warned,
never silent."""
import json
import os

import numpy as np
import pytest

from .helpers import small_world


@pytest.fixture(scope="module")
def longworld(tmp_path_factory):
    """Small world + a FASTQ mixing normal reads with 1.2 kb genome slices
    ("nanopore-style") whose exact assignments golden computes whole."""
    from pangea_tpu import cli
    from pangea_tpu.utils import datagen

    d = str(tmp_path_factory.mktemp("long_td"))
    tax, genomes, idx, rs = small_world(n_reads=60, genome_len=3000)
    datagen.write_fasta(os.path.join(d, "refs.fasta"), genomes, tax)
    datagen.write_taxonomy_tsv(os.path.join(d, "taxonomy.tsv"), tax)
    assert cli.main(["build", "--refs", f"{d}/refs.fasta",
                     "--taxonomy", f"{d}/taxonomy.tsv", "--k", "21",
                     "--out", f"{d}/idx"]) == 0

    rng = np.random.default_rng(5)
    long_reads = []
    for j in range(8):
        codes, taxon = genomes[rng.integers(0, len(genomes))]
        s = rng.integers(0, len(codes) - 1200)
        long_reads.append(np.asarray(codes[s:s + 1200], dtype=np.uint8))

    b2c = np.array(list("ACGTN"))
    with open(os.path.join(d, "mix.fastq"), "w") as fh:
        for i, seq in enumerate(rs.seqs):
            fh.write(f"@short{i}\n{''.join(b2c[seq])}\n+\n{'I' * len(seq)}\n")
        for i, seq in enumerate(long_reads):
            fh.write(f"@long{i}\n{''.join(b2c[seq])}\n+\n{'I' * len(seq)}\n")
    return d, idx, rs, long_reads


def _run(d, out, extra):
    from pangea_tpu import cli
    args = ["classify", "--index", f"{d}/idx", "--reads", f"{d}/mix.fastq",
            "--samples", "s", "--out", out, "input.batch_size=32",
            "input.max_read_len=150"] + extra
    assert cli.main(args) == 0


def _assignments(out):
    res = {}
    for line in open(f"{out}/s.assign.tsv"):
        f = line.rstrip("\n").split("\t")
        res[f[1]] = (int(f[2]), f[5])
    return res


def test_long_reads_exact_via_cli(longworld, tmp_path):
    """input.long_reads=true: every 1.2 kb read's (taxon, best/nvalid)
    equals the golden whole-read result — no truncation."""
    from pangea_tpu.golden import classify_read_golden
    from pangea_tpu.index import Index

    d, idx, rs, long_reads = longworld
    out = str(tmp_path / "o1")
    _run(d, out, ["input.long_reads=true"])
    got = _assignments(out)
    summary = json.load(open(f"{out}/run_summary.json"))
    assert summary["truncated_reads"] == 0
    idx2 = Index.load(f"{d}/idx")
    for i, seq in enumerate(long_reads):
        want = classify_read_golden(seq, idx2, 0.0)
        assert got[f"long{i}"] == (want.taxon,
                                   f"{want.best}/{want.nvalid}"), i
    # short reads ride the same run unchanged
    for i, seq in enumerate(rs.seqs):
        want = classify_read_golden(seq, idx2, 0.0)
        assert got[f"short{i}"] == (want.taxon,
                                    f"{want.best}/{want.nvalid}"), i


def test_long_reads_beyond_cap_truncate_with_warning(longworld, tmp_path,
                                                     capsys):
    """Reads past input.max_long_read_len classify from their prefix and
    are COUNTED (run_summary.truncated_reads) + warned."""
    d, idx, rs, long_reads = longworld
    out = str(tmp_path / "o2")
    _run(d, out, ["input.long_reads=true", "input.max_long_read_len=600"])
    summary = json.load(open(f"{out}/run_summary.json"))
    assert summary["truncated_reads"] == len(long_reads)
    assert "truncated" in capsys.readouterr().err


def test_fast_path_counts_truncated(longworld, tmp_path):
    """Without long_reads, the native fast path truncates at max_read_len
    but must report how many reads it truncated."""
    d, idx, rs, long_reads = longworld
    out = str(tmp_path / "o3")
    _run(d, out, [])
    summary = json.load(open(f"{out}/run_summary.json"))
    if not summary.get("fast_path"):
        pytest.skip("native io unavailable")
    assert summary["truncated_reads"] == len(long_reads)
