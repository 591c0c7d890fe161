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
    for x, y in zip(a[:4], b[:4]):
        np.testing.assert_array_equal(x, y)


def test_single_probe_invariant(world):
    # Every stored k-mer lives in its ONE bucket `h & (NB-1)` or the stash
    # (SEMANTICS.md §5 v5), and is stored exactly once overall.
    _, _, idx, _ = world
    from pangea_tpu.index.build import bucket_of_np
    canon, _ = extract_pairs(idx)
    hi = (canon >> np.uint64(32)).astype(np.uint32)
    lo = (canon & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    b = bucket_of_np(canon, idx.meta.n_buckets)
    count = ((idx.key_hi[b] == hi[:, None])
             & (idx.key_lo[b] == lo[:, None])).sum(axis=1)
    if idx.stash.shape[1]:
        count = count + ((idx.stash[0][None, :] == hi[:, None])
                         & (idx.stash[1][None, :] == lo[:, None])).sum(axis=1)
    np.testing.assert_array_equal(count, np.ones_like(count))


def test_stash_overflow_path():
    # Force bucket overflow: tiny table at very high load. Overflow keys go
    # to the stash (ascending canonical order) and stay findable; if more
    # than STASH_MAX keys overflow, NB doubles instead.
    from pangea_tpu.index.build import layout_table, bucket_of_np, WAYS
    rng = np.random.default_rng(5)
    n = 250  # ~0.98 load on 256 slots (nb=8 × 32)
    kmers = np.unique(rng.integers(0, 1 << 42, size=n * 2).astype(np.uint64))[:n]
    taxa = rng.integers(1, 100, size=n).astype(np.int32)
    key_hi, key_lo, val, stash, nb = layout_table(kmers, taxa,
                                                  load_factor=1.0)
    hi = (kmers >> np.uint64(32)).astype(np.uint32)
    lo = (kmers & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    b = bucket_of_np(kmers, nb)
    m = (key_hi[b] == hi[:, None]) & (key_lo[b] == lo[:, None])
    lane = np.argmax(m, axis=1)
    found = np.where(m.any(axis=1), val[b, lane], 0).astype(np.int32)
    sm = (stash[0][None, :] == hi[:, None]) & (stash[1][None, :] == lo[:, None])
    sl = np.argmax(sm, axis=1)
    found = np.where(sm.any(axis=1) & (found == 0),
                     stash[2].view(np.int32)[sl], found)
    np.testing.assert_array_equal(found, taxa)
    # no bucket stores more than WAYS keys; overflow is exactly the stash
    occ = (key_hi != np.uint32(EMPTY_HI)).sum()
    assert occ + stash.shape[1] == n
    if stash.shape[1]:
        scanon = (stash[0].astype(np.uint64) << np.uint64(32)) \
            | stash[1].astype(np.uint64)
        assert (np.diff(scanon.astype(np.int64)) > 0).all()  # ascending


def test_save_load_roundtrip(tmp_path, world):
    _, _, idx, _ = world
    p = str(tmp_path / "idx")
    idx.save(p)
    idx2 = Index.load(p)
    np.testing.assert_array_equal(idx.key_hi, np.asarray(idx2.key_hi))
    np.testing.assert_array_equal(idx.key_lo, np.asarray(idx2.key_lo))
    np.testing.assert_array_equal(idx.val, np.asarray(idx2.val))
    np.testing.assert_array_equal(idx.stash, np.asarray(idx2.stash))
    assert idx2.meta == idx.meta


def test_shard_tables_cover_all_kmers(world):
    _, _, idx, _ = world
    canon, taxa = extract_pairs(idx)
    for n in (1, 2, 4, 8):
        key_hi, key_lo, val, stash = shard_tables(idx, n)
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
            socc = stash[s][0] != np.uint32(EMPTY_HI)
            sc = (stash[s][0][socc].astype(np.uint64) << np.uint64(32)) \
                | stash[s][1][socc].astype(np.uint64)
            for cv, tv in zip(sc.tolist(),
                              stash[s][2][socc].view(np.int32).tolist()):
                stored.add((cv, tv))
        assert stored == set(zip(canon.tolist(), taxa.tolist()))


def test_minimizer_index_smaller(world):
    tax, genomes, _, _ = world
    idx_full = build_index(genomes, tax, k=21, w=1)
    idx_min = build_index(genomes, tax, k=21, w=8)
    assert idx_min.meta.n_kmers < idx_full.meta.n_kmers * 0.5
