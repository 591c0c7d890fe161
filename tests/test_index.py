import numpy as np
import pytest

from pangea_tpu.core import canonical_kmers, hash32_np
from pangea_tpu.index import Index, build_index
from pangea_tpu.index.build import layout_table
from pangea_tpu.index.container import EMPTY_HI
from pangea_tpu.index.shard import extract_pairs, shard_tables
from pangea_tpu.utils import datagen

from .helpers import small_world


@pytest.fixture(scope="module")
def world():
    return small_world()


def test_all_kmers_findable(world):
    tax, genomes, idx, _ = world
    canon, taxa = extract_pairs(idx)
    # every stored k-mer must look up to its stored taxon
    got = idx.lookup_np(canon, np.ones(canon.shape, bool))
    np.testing.assert_array_equal(got, taxa)


def test_absent_kmers_miss(world):
    _, _, idx, _ = world
    rng = np.random.default_rng(9)
    canon, taxa = extract_pairs(idx)
    present = set(canon.tolist())
    probes = rng.integers(0, 1 << 42, size=5000).astype(np.uint64)
    mask = np.array([int(p) not in present for p in probes])
    got = idx.lookup_np(probes, np.ones(probes.shape, bool))
    assert (got[mask] == 0).all()


def test_lca_dedupe(world):
    tax, genomes, idx, _ = world
    # genus-core k-mers (shared by all species of a genus) must map to genus
    codes, taxon = genomes[0]
    core = codes[:750]  # genus core prefix (core_frac=0.25 of 3000bp)
    canon, valid = canonical_kmers(core, idx.meta.k)
    got = idx.lookup_np(canon, valid)
    genus = int(tax.parent[taxon])
    # all core k-mers (unique to this genus across the toy world) → genus
    assert (got[valid] == genus).mean() > 0.95


def test_layout_determinism(world):
    _, genomes, idx, _ = world
    canon, taxa = extract_pairs(idx)
    a = layout_table(canon, taxa)
    b = layout_table(canon, taxa)
    for x, y in zip(a[:3], b[:3]):
        np.testing.assert_array_equal(x, y)


def test_two_choice_invariant(world):
    # Every stored k-mer lives in bucket b1 or b2 (SEMANTICS.md §5 v3) and
    # is stored exactly once.
    _, _, idx, _ = world
    from pangea_tpu.index.build import bucket_pair_np
    canon, _ = extract_pairs(idx)
    hi = (canon >> np.uint64(32)).astype(np.uint32)
    lo = (canon & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    b1, b2 = bucket_pair_np(canon, idx.meta.n_buckets)
    in1 = ((idx.key_hi[b1] == hi[:, None])
           & (idx.key_lo[b1] == lo[:, None])).sum(axis=1)
    in2 = ((idx.key_hi[b2] == hi[:, None])
           & (idx.key_lo[b2] == lo[:, None])).sum(axis=1)
    same = b1 == b2
    count = np.where(same, in1, in1 + in2)
    np.testing.assert_array_equal(count, np.ones_like(count))


def test_eviction_path():
    # Force cuckoo evictions: tiny table at high load. All keys must remain
    # findable and the 2-choice invariant must hold.
    from pangea_tpu.index.build import layout_table, bucket_pair_np
    rng = np.random.default_rng(5)
    n = 220  # > 0.85 load on 256 slots (nb=32 × 8)
    kmers = np.unique(rng.integers(0, 1 << 42, size=n * 2).astype(np.uint64))[:n]
    taxa = rng.integers(1, 100, size=n).astype(np.int32)
    key_hi, key_lo, val, nb = layout_table(kmers, taxa, load_factor=0.9)
    hi = (kmers >> np.uint64(32)).astype(np.uint32)
    lo = (kmers & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    b1, b2 = bucket_pair_np(kmers, nb)
    found = np.zeros(n, dtype=np.int32)
    for b in (b1, b2):
        m = (key_hi[b] == hi[:, None]) & (key_lo[b] == lo[:, None])
        lane = np.argmax(m, axis=1)
        hitv = val[b, lane]
        found = np.where(m.any(axis=1) & (found == 0), hitv, found)
    np.testing.assert_array_equal(found, taxa)


def test_save_load_roundtrip(tmp_path, world):
    _, _, idx, _ = world
    p = str(tmp_path / "idx")
    idx.save(p)
    idx2 = Index.load(p)
    np.testing.assert_array_equal(idx.key_hi, np.asarray(idx2.key_hi))
    np.testing.assert_array_equal(idx.key_lo, np.asarray(idx2.key_lo))
    np.testing.assert_array_equal(idx.val, np.asarray(idx2.val))
    assert idx2.meta == idx.meta


def test_shard_tables_cover_all_kmers(world):
    _, _, idx, _ = world
    canon, taxa = extract_pairs(idx)
    for n in (1, 2, 4, 8):
        key_hi, key_lo, val = shard_tables(idx, n)
        assert key_hi.shape[0] == n
        NB = key_hi.shape[1]
        assert NB & (NB - 1) == 0
        # union of occupied (deduped — padding tiles duplicate) == kmer set
        stored = set()
        for s in range(n):
            occ = key_hi[s] != np.uint32(EMPTY_HI)
            c = (key_hi[s][occ].astype(np.uint64) << np.uint64(32)) \
                | key_lo[s][occ].astype(np.uint64)
            for cv, tv in zip(c.tolist(), val[s][occ].tolist()):
                stored.add((cv, tv))
        assert stored == set(zip(canon.tolist(), taxa.tolist()))


def test_minimizer_index_smaller(world):
    tax, genomes, _, _ = world
    idx_full = build_index(genomes, tax, k=21, w=1)
    idx_min = build_index(genomes, tax, k=21, w=8)
    assert idx_min.meta.n_kmers < idx_full.meta.n_kmers * 0.5
