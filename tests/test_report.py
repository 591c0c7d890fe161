import numpy as np
import pytest

from pangea_tpu.report import stats
from pangea_tpu.report.writers import (AssignmentRecord, read_assignments,
                                       summarize, write_assignments,
                                       write_cohort_summary, write_summary)
from pangea_tpu.utils import datagen


@pytest.fixture
def tax():
    return datagen.make_taxonomy()


def test_summarize_clade_rollup(tax):
    # two species of genus 3 (ids 4, 5) + one direct genus hit
    taxa = np.array([4, 4, 5, 3, 0], np.int64)
    direct, clade = summarize(taxa, tax)
    assert direct[4] == 2 and direct[5] == 1 and direct[3] == 1
    assert clade[3] == 4            # genus rolls up both species + itself
    assert clade[1] == 4            # root clade = all classified
    assert clade[0] == direct[0] == 1


def test_summary_file_format(tmp_path, tax):
    taxa = np.array([4, 4, 0], np.int64)
    p = str(tmp_path / "s.tsv")
    write_summary(p, taxa, tax)
    lines = open(p).read().splitlines()
    assert lines[0] == "33.33\t1\t1\tno_rank\t0\tunclassified"
    assert lines[1] == "66.67\t2\t0\troot\t1\troot"
    # DFS order with 2-space indent per depth
    assert lines[2].startswith("66.67\t2\t0\tphylum\t2\t  Phylum_0")
    assert lines[-1].endswith("      Species_0_0_0")


def test_assignments_roundtrip(tmp_path, tax):
    recs = [AssignmentRecord("r1", 4, 10, 20),
            AssignmentRecord("r2", 0, 0, 15)]
    p = str(tmp_path / "a.tsv")
    write_assignments(p, recs, tax)
    text = open(p).read()
    assert text.splitlines()[0] == \
        "C\tr1\t4\tspecies\tSpecies_0_0_0\t10/20\t0.500000"
    assert text.splitlines()[1] == \
        "U\tr2\t0\tno_rank\tunclassified\t0/15\t0.000000"
    back = read_assignments(p)
    assert back == recs


def test_cohort_summary(tmp_path, tax):
    p = str(tmp_path / "c.tsv")
    write_cohort_summary(p, {"s1": np.array([4, 4]), "s2": np.array([5, 0])},
                         tax)
    lines = open(p).read().splitlines()
    assert lines[0] == "taxid\trank\tname\ts1\ts2"
    assert lines[1] == "0\tno_rank\tunclassified\t0\t1"
    genus = [l for l in lines if "Genus_0_0" in l][0]
    assert genus.split("\t")[3:] == ["2", "1"]


def test_stats():
    counts = np.array([10, 5, 1, 1, 2, 0])
    assert stats.richness(counts) == 5
    assert stats.chao1(counts) == 5 + 2 ** 2 / (2 * 1)  # F1=2, F2=1
    assert 0 < stats.shannon(counts) < np.log(5)
    assert 0 < stats.simpson(counts) < 1
    assert stats.shannon([]) == 0.0
    # rarefaction: monotone, capped at n, endpoint = observed richness
    r = stats.rarefaction(counts, [1, 5, 19, 100])
    assert r[-1][0] == 19 and abs(r[-1][1] - 5) < 1e-9
    assert r[0][1] <= r[1][1] <= r[2][1]
    # bray-curtis: identical → 0, disjoint → 1
    assert stats.bray_curtis([1, 0], [1, 0]) == 0.0
    assert stats.bray_curtis([1, 0], [0, 2]) == 1.0


def test_count_taxa_tsv_matches_read_assignments(tmp_path):
    """Streaming counter (100M-resume path) == per-record parse."""
    import numpy as np
    from pangea_tpu.report.writers import (count_taxa_tsv,
                                           format_assignment,
                                           read_assignments)
    from pangea_tpu.report import AssignmentRecord
    from .helpers import chain_taxonomy
    tax = chain_taxonomy(6)
    rng = np.random.default_rng(5)
    recs = [AssignmentRecord(f"r{i}", int(rng.integers(0, 7)),
                             int(rng.integers(0, 9)), 8)
            for i in range(5000)]
    p = str(tmp_path / "a.assign.tsv")
    with open(p, "w") as fh:
        for r in recs:
            fh.write(format_assignment(r, tax))
    got = count_taxa_tsv(p, tax.num_taxa, chunk_lines=256)
    want = np.bincount([r.taxon for r in read_assignments(p)],
                       minlength=tax.num_taxa + 1)
    np.testing.assert_array_equal(got, want)
