"""Out-of-core sharded index build (VERDICT r1 #4; SURVEY.md §8.4.6).

The contract under test: build_index_ooc writes a sharded container whose
device tables are BIT-IDENTICAL to the in-memory build_index + shard_tables
path for the same genome stream, at matching AND mismatched mesh shard
counts, and whose host lookup agrees with the monolithic golden lookup.
"""
import numpy as np
import pytest

from pangea_tpu.index import (Index, ShardedIndex, build_index,
                              build_index_ooc, load_index_any)
from pangea_tpu.index.shard import extract_pairs, shard_tables
from pangea_tpu.utils import datagen

from .helpers import small_world


@pytest.fixture(scope="module")
def world():
    return small_world()


@pytest.fixture(scope="module")
def ooc(world, tmp_path_factory):
    tax, genomes, idx, _ = world
    out = tmp_path_factory.mktemp("ooc_idx")
    sidx = build_index_ooc(genomes, tax, k=idx.meta.k, out=str(out),
                           n_shards=4, parts_per_shard=4)
    return sidx, out


def test_roundtrip_load(ooc, world):
    sidx, out = ooc
    _, _, idx, _ = world
    loaded = load_index_any(str(out))
    assert isinstance(loaded, ShardedIndex)
    assert loaded.meta.n_shards == 4
    assert loaded.meta.n_kmers == idx.meta.n_kmers
    assert loaded.meta.taxonomy_hash == idx.meta.taxonomy_hash


def test_tables_bit_identical_matching_shards(ooc, world):
    """File shards == mesh shards: mmap path vs monolithic re-layout."""
    _, _, idx, _ = world
    sidx, _ = ooc
    mono = shard_tables(idx, 4)
    shrd = sidx.shard_tables(4)
    for a, b in zip(mono, shrd):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("n_mesh", [1, 2, 8])
def test_tables_bit_identical_mismatched_shards(ooc, world, n_mesh):
    """Mesh shard count below (merge) and above (split) the file's."""
    _, _, idx, _ = world
    sidx, _ = ooc
    mono = shard_tables(idx, n_mesh)
    shrd = shard_tables(sidx, n_mesh)   # dispatches to ShardedIndex
    for a, b in zip(mono, shrd):
        np.testing.assert_array_equal(a, b)


def test_lookup_np_parity(ooc, world):
    _, _, idx, _ = world
    sidx, _ = ooc
    canon, taxa = extract_pairs(idx)
    rng = np.random.default_rng(3)
    absent = rng.integers(0, 1 << 42, size=4096).astype(np.uint64)
    probes = np.concatenate([canon, absent])
    valid = rng.random(probes.shape[0]) < 0.9
    np.testing.assert_array_equal(sidx.lookup_np(probes, valid),
                                  idx.lookup_np(probes, valid))


def test_dedupe_lca_matches_python_fold(world):
    """The vectorized Euler-fold dedupe equals the per-group lca_many loop
    (the pre-r2 semantics) on adversarial duplicate groups."""
    tax, _, _, _ = world
    from pangea_tpu.index.build import dedupe_lca
    rng = np.random.default_rng(7)
    n = 5000
    kmers = rng.integers(0, 50, size=n).astype(np.uint64)  # heavy dupes
    taxa = rng.integers(1, tax.num_taxa + 1, size=n).astype(np.int32)
    uk, ut = dedupe_lca(kmers, taxa, tax)
    # reference: python fold per group
    ref = {}
    for km, t in zip(kmers.tolist(), taxa.tolist()):
        ref.setdefault(km, []).append(t)
    assert uk.tolist() == sorted(ref)
    for km, got in zip(uk.tolist(), ut.tolist()):
        assert got == tax.lca_many(ref[km]), km


def test_streaming_placement_bit_identical(ooc, world):
    """The mmap streaming placement (matching shard counts) produces device
    arrays bit-identical to the in-RAM stack+fuse path."""
    import jax

    from pangea_tpu.dist import MeshConfig, make_mesh, place_index

    tax, genomes, idx, _ = world
    sidx, _ = ooc
    mesh = make_mesh(MeshConfig(n_data=2, n_shard=4))
    di_stream = place_index(sidx, mesh)        # streaming path (4 == 4)
    di_ram = place_index(idx, mesh)            # monolithic re-layout path
    np.testing.assert_array_equal(np.asarray(di_stream.fused),
                                  np.asarray(di_ram.fused))
    np.testing.assert_array_equal(np.asarray(di_stream.stash),
                                  np.asarray(di_ram.stash))
    assert di_stream.cfg == di_ram.cfg


def test_classify_end_to_end_sharded(ooc, world, tmp_path):
    """Reports from a sharded on-disk index are byte-identical to the
    monolithic index through the public run_classify path."""
    import os

    from pangea_tpu.config import RunConfig
    from pangea_tpu.pipeline import run_classify

    tax, genomes, idx, rs = world
    _, out = ooc
    mono_dir = tmp_path / "mono_idx"
    idx.save(str(mono_dir))
    reads = tmp_path / "reads.fastq"
    datagen.write_fastq(str(reads), rs, mate=1)

    results = {}
    for name, ipath in (("mono", mono_dir), ("shard", out)):
        od = tmp_path / f"out_{name}"
        cfg = RunConfig()
        cfg.classify.index = [str(ipath)]
        cfg.input.reads = [str(reads)]
        cfg.input.batch_size = 64
        cfg.input.max_read_len = 120
        cfg.classify.out_dir = str(od)
        cfg.mesh.n_data = 2
        cfg.mesh.n_shard = 4
        run_classify(cfg, progress=False)
        results[name] = {
            f: open(os.path.join(od, f), "rb").read()
            for f in sorted(os.listdir(od))
            if f.endswith((".tsv",))}
    assert results["mono"] == results["shard"]
