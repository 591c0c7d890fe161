"""VERDICT r1 #9 hardening: exact multi-k merge for any int32, NCBI root
validation, sample-name de-collision, report over nodes.dmp."""
import jax
import numpy as np
import pytest

from pangea_tpu.classify.merge import merge_multik_jnp, merge_multik_np
from pangea_tpu.golden import GoldenResult, merge_multik_golden
from pangea_tpu.taxonomy import Taxonomy

from .helpers import small_world


def _merge_inputs(tax, cases):
    r1 = {k: np.array([c[0][i] for c in cases], np.int32)
          for i, k in enumerate(("taxon", "best", "nvalid"))}
    r2 = {k: np.array([c[1][i] for c in cases], np.int32)
          for i, k in enumerate(("taxon", "best", "nvalid"))}
    return r1, r2


def test_merge_exact_beyond_int32_products():
    """SEMANTICS.md §9 cross-multiplications must be exact for ANY int32
    (best, nvalid) — e.g. 100 kb long-read buckets where nvalid > 2^15 and
    b*n overflows int32. The jnp path uses 64-bit limb products; both twins
    must match the arbitrary-precision golden rule."""
    tax = small_world(n_reads=1)[0]
    big = 2**30
    cases = [  # (taxon, best, nvalid) pairs engineered to wrap int32
        ((3, big, big + 1), (3, big + 1, big)),        # agree, conf1 < conf2
        ((3, big + 1, big), (3, big, big + 1)),        # agree, conf1 > conf2
        ((3, big, big), (5, big - 1, big)),            # conflict, x1 > x2
        ((5, big - 1, big), (3, big, big)),            # conflict, x1 < x2
        ((3, 70000, 70001), (3, 70000, 70001)),        # exact tie
        ((0, 0, 40000), (7, 123, 70000)),              # one-sided
        ((0, 0, 50000), (0, 0, 60000)),                # both unclassified
        ((3, 2**31 - 1, 2**31 - 1), (5, 2**31 - 2, 2**31 - 1)),  # extremes
    ]
    r1, r2 = _merge_inputs(tax, cases)
    arrs = {k: jax.device_put(v)
            for k, v in tax.device_arrays().items()}
    got_j = {k: np.asarray(v) for k, v in
             merge_multik_jnp({k: jax.device_put(v) for k, v in r1.items()},
                              {k: jax.device_put(v) for k, v in r2.items()},
                              arrs).items()}
    got_n = merge_multik_np(r1, r2, tax)
    for i, (a, b) in enumerate(cases):
        want = merge_multik_golden(GoldenResult(*a), GoldenResult(*b), tax)
        for got in (got_j, got_n):
            assert (int(got["taxon"][i]), int(got["best"][i]),
                    int(got["nvalid"][i])) == \
                (want.taxon, want.best, want.nvalid), (i, a, b)


def test_ncbi_rejects_bad_root(tmp_path):
    nodes = tmp_path / "nodes.dmp"
    names = tmp_path / "names.dmp"
    names.write_text("2\t|\tx\t|\t\t|\tscientific name\t|\n")
    nodes.write_text("")                          # empty
    with pytest.raises(ValueError, match="empty"):
        Taxonomy.load_ncbi(str(nodes), str(names))
    nodes.write_text("2\t|\t2\t|\tno rank\t|\n")  # no taxid 1
    with pytest.raises(ValueError, match="root taxid 1"):
        Taxonomy.load_ncbi(str(nodes), str(names))
    nodes.write_text("1\t|\t2\t|\tno rank\t|\n"   # root with wrong parent
                     "2\t|\t1\t|\tno rank\t|\n")
    with pytest.raises(ValueError, match="root taxid 1"):
        Taxonomy.load_ncbi(str(nodes), str(names))


def test_default_sample_names_decollide():
    from pangea_tpu.pipeline.run import default_sample_names
    got = default_sample_names(["/a/reads.fastq", "/b/reads.fastq",
                                "/c/other.fq", "/d/reads.fastq.gz"])
    assert got == ["reads", "reads_2", "other", "reads_3"]
    assert len(set(got)) == len(got)


def test_report_accepts_nodes_dmp(tmp_path):
    """`pangea-tpu report --taxonomy nodes.dmp --names-dmp names.dmp`
    (VERDICT r1 weak #8: previously NPZ/TSV only)."""
    from pangea_tpu.cli import main
    nodes = tmp_path / "nodes.dmp"
    names = tmp_path / "names.dmp"
    nodes.write_text("1\t|\t1\t|\tno rank\t|\n"
                     "2\t|\t1\t|\tgenus\t|\n"
                     "3\t|\t2\t|\tspecies\t|\n")
    names.write_text("1\t|\troot\t|\t\t|\tscientific name\t|\n"
                     "2\t|\tG\t|\t\t|\tscientific name\t|\n"
                     "3\t|\tS\t|\t\t|\tscientific name\t|\n")
    assign = tmp_path / "s1.assign.tsv"
    assign.write_text("C\tread0\t3\tspecies\tS\t9/10\t0.900000\n"
                      "C\tread1\t2\tgenus\tG\t5/10\t0.500000\n"
                      "U\tread2\t0\tno_rank\tunclassified\t0/10\t0.000000\n")
    out = tmp_path / "rep"
    rc = main(["report", "--assignments", str(assign), "--taxonomy",
               str(nodes), "--names-dmp", str(names), "--out-dir", str(out)])
    assert rc == 0
    summary = (out / "s1.summary.tsv").read_text()
    assert "S" in summary and "G" in summary
