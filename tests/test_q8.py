"""q8 quotiented-key layout (kernels/lookup.py q8 section, VERDICT r2 #6a):
8 B/slot single-probe tables. Exactness rests on the bijective quotient
mix — these tests pin the bijection, the layout round-trip, and full
classify bit-parity vs golden through both the single-device and sharded
entry points."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pangea_tpu.classify.engine import (ClassifyConfig, DeviceIndex,
                                        make_classify_fn, pad_batch)
from pangea_tpu.golden import classify_reads_golden
from pangea_tpu.index.build import build_index
from pangea_tpu.index.shard import extract_pairs
from pangea_tpu.kernels.lookup import (_Q8_WAYS, lookup_q8_jnp, q8_hash_np,
                                       q8_layout)

from .helpers import small_world


@pytest.fixture(scope="module")
def world():
    return small_world(n_reads=150)


def test_q8_hash_bijective():
    """(K * A) mod 2^(2k) with A odd is a bijection — spot-check no
    collisions over a dense low range + random 42-bit values (k=21)."""
    k = 21
    rng = np.random.default_rng(0)
    ks = np.unique(np.concatenate([
        np.arange(10000, dtype=np.uint64),
        rng.integers(0, 1 << 42, size=200000, dtype=np.uint64)]))
    h = q8_hash_np(ks, k)
    assert np.unique(h).shape[0] == ks.shape[0]


def test_q8_layout_roundtrip(world):
    """Every stored k-mer must be found with its exact taxon interval;
    absent k-mers (random probes) must miss — no false positives."""
    tax, _, idx, _ = world
    canon, taxa = extract_pairs(idx)
    out = q8_layout(canon, taxa, tax.tin, tax.tout, idx.meta.k)
    assert out is not None
    fusedq, stash3, nb = out
    assert fusedq.shape == (nb, 2 * _Q8_WAYS)
    from pangea_tpu.kernels.lookup import fuse_stash
    stash = fuse_stash(stash3, tax.tin, tax.tout)
    rng = np.random.default_rng(1)
    absent = rng.integers(0, 1 << (2 * idx.meta.k), size=5000,
                          dtype=np.uint64)
    absent = absent[~np.isin(absent, canon)]
    qs = np.concatenate([canon, absent])
    hi = (qs >> np.uint64(32)).astype(np.uint32)
    lo = (qs & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hit, t_in, t_out = map(np.asarray, lookup_q8_jnp(
        jnp.array(hi), jnp.array(lo), jnp.ones(qs.shape, bool),
        jnp.array(fusedq), jnp.array(stash), k=idx.meta.k))
    n = canon.shape[0]
    np.testing.assert_array_equal(hit[:n], 1)
    np.testing.assert_array_equal(t_in[:n], tax.tin[taxa])
    np.testing.assert_array_equal(t_out[:n], tax.tout[taxa])
    np.testing.assert_array_equal(hit[n:], 0)
    np.testing.assert_array_equal(t_in[n:], 0)
    # invalid positions never hit
    hit2 = np.asarray(lookup_q8_jnp(
        jnp.array(hi[:n]), jnp.array(lo[:n]), jnp.zeros(n, bool),
        jnp.array(fusedq), jnp.array(stash), k=idx.meta.k)[0])
    np.testing.assert_array_equal(hit2, 0)


@pytest.mark.parametrize("threshold", [0.0, 0.3])
def test_q8_classify_bit_exact_vs_golden(world, threshold, monkeypatch):
    monkeypatch.setenv("PANGEA_LAYOUT", "q8")
    tax, _, idx, rs = world
    di = DeviceIndex.from_index(idx, confidence_threshold=threshold)
    assert di.cfg.layout == "q8" and di.cfg.ways == _Q8_WAYS
    fn = make_classify_fn(di.cfg)
    bases = pad_batch(rs.seqs, len(rs.seqs), 120)
    out = {k: np.asarray(v) for k, v in fn(di.tables, bases).items()}
    want = classify_reads_golden(rs.seqs, idx, threshold)
    np.testing.assert_array_equal(out["taxon"], [r.taxon for r in want])
    np.testing.assert_array_equal(out["best"], [r.best for r in want])
    np.testing.assert_array_equal(out["nvalid"], [r.nvalid for r in want])


def test_q8_classify_paired_and_sharded(world, monkeypatch):
    """q8 through the sharded (data-parallel) entry point: mesh (2, 1),
    paired reads — bit-exact vs golden."""
    from pangea_tpu.dist import MeshConfig, make_mesh, place_index
    from pangea_tpu.dist.mesh import batch_sharding, make_sharded_classify_fn
    from pangea_tpu.utils import datagen
    monkeypatch.setenv("PANGEA_LAYOUT", "q8")
    tax, genomes, idx, _ = world
    rs = datagen.sample_reads(genomes, 96, read_len=110, paired=True,
                              n_prob=0.02, seed=8)
    mesh = make_mesh(MeshConfig(n_data=2, n_shard=1),
                     devices=jax.devices()[:2])
    di = place_index(idx, mesh, 0.1)
    assert di.cfg.layout == "q8"
    fn = make_sharded_classify_fn(di.cfg, mesh, paired=True)
    b1 = jax.device_put(pad_batch(rs.seqs, 96, 110), batch_sharding(mesh))
    b2 = jax.device_put(pad_batch(rs.mates, 96, 110), batch_sharding(mesh))
    out = {k: np.asarray(v) for k, v in fn(di.tables, b1, b2).items()}
    want = classify_reads_golden(rs.seqs, idx, 0.1, mates=rs.mates)
    np.testing.assert_array_equal(out["taxon"], [r.taxon for r in want])
    np.testing.assert_array_equal(out["best"], [r.best for r in want])
    np.testing.assert_array_equal(out["nvalid"], [r.nvalid for r in want])


def test_q8_lifting_path_matches_direct(world, monkeypatch):
    """score_reads_tin_jnp's binary-lifting branch (big taxonomies) must
    agree with the direct branch — force it by shrinking the direct cap."""
    from pangea_tpu.kernels import score as score_mod
    monkeypatch.setenv("PANGEA_LAYOUT", "q8")
    tax, _, idx, rs = world
    di = DeviceIndex.from_index(idx, confidence_threshold=0.0)
    fn = make_classify_fn(di.cfg)
    bases = pad_batch(rs.seqs, len(rs.seqs), 120)
    want = {k: np.asarray(v) for k, v in fn(di.tables, bases).items()}
    monkeypatch.setattr(score_mod, "_DIRECT_LCA_MAX_TAXA", 0)
    fn2 = make_classify_fn(di.cfg)   # new trace picks up the patched cap
    got = {k: np.asarray(v) for k, v in fn2(di.tables, bases).items()}
    for k in ("taxon", "best", "nvalid"):
        np.testing.assert_array_equal(got[k], want[k])


def test_q8_auto_policy():
    """q8 eligibility bounds via the unified plan (r4: the fast-regime
    cap is retired — q8 applies at ANY size where exactness is sane):
    k=31 never qualifies; wide Euler stamps never qualify."""
    from pangea_tpu.index.build import q8_plan_sharded
    assert q8_plan_sharded(2_000_000, 1, 21, 100) is not None
    assert q8_plan_sharded(2_000_000, 1, 31, 100) is None   # rem > 31
    assert q8_plan_sharded(2_000_000, 1, 21, 100_000) is None
    assert q8_plan_sharded(400_000_000, 1, 21, 100) is not None


def test_tin2node_inverse(world):
    tax, _, _, _ = world
    arrs = tax.device_arrays()
    inv = arrs["tin2node"]
    for t in range(1, tax.num_taxa + 1):
        assert inv[tax.tin[t]] == t


def test_sharded_index_single_shard_mesh(tmp_path):
    """A ShardedIndex placed on an n_shard=1 mesh (round-3 review: this
    path crashed when the q8 relayout could only read monolithic tables;
    since r4 extract_pairs handles sharded sources, so the merged table
    goes q8) — must classify bit-exact vs the monolithic golden."""
    from pangea_tpu.dist import MeshConfig, make_mesh, place_index
    from pangea_tpu.dist.mesh import batch_sharding, make_sharded_classify_fn
    from pangea_tpu.index import build_index_ooc, load_index_any
    from pangea_tpu.utils import datagen
    tax = datagen.make_taxonomy(seed=3)
    genomes = datagen.make_genomes(tax, genome_len=3000, seed=4)
    sidx = build_index_ooc(((g, t) for g, t in genomes), tax, k=21,
                           out=str(tmp_path / "idx"), n_shards=4)
    sidx = load_index_any(str(tmp_path / "idx"))
    mesh = make_mesh(MeshConfig(n_data=1, n_shard=1),
                     devices=jax.devices()[:1])
    di = place_index(sidx, mesh, 0.0)
    assert di.cfg.layout == "q8"
    rs = datagen.sample_reads(genomes, 64, read_len=110, seed=5)
    fn = make_sharded_classify_fn(di.cfg, mesh)
    b = jax.device_put(pad_batch(rs.seqs, 64, 110), batch_sharding(mesh))
    out = {k: np.asarray(v) for k, v in fn(di.tables, b).items()}
    mono = build_index(genomes, tax, k=21)
    want = classify_reads_golden(rs.seqs, mono, 0.0)
    np.testing.assert_array_equal(out["taxon"], [r.taxon for r in want])


@pytest.mark.parametrize("shape", [(1, 8), (2, 4), (8, 1)])
def test_q8_sharded_mesh_bit_exact(world, shape, monkeypatch):
    """Per-shard q8 tables (VERDICT r3 #1) across mesh shapes: forced q8
    layout, psum merge over the shard axis — bit-exact vs golden."""
    from pangea_tpu.dist import MeshConfig, make_mesh, place_index
    from pangea_tpu.dist.mesh import batch_sharding, make_sharded_classify_fn
    monkeypatch.setenv("PANGEA_LAYOUT", "q8")
    tax, _, idx, rs = world
    mesh = make_mesh(MeshConfig(*shape))
    di = place_index(idx, mesh, confidence_threshold=0.1)
    assert di.cfg.layout == "q8" and di.cfg.n_shards == shape[1]
    fn = make_sharded_classify_fn(di.cfg, mesh)
    n = len(rs.seqs) - len(rs.seqs) % shape[0]
    bases = jax.device_put(pad_batch(rs.seqs[:n], n, 120),
                           batch_sharding(mesh))
    out = {k: np.asarray(v) for k, v in fn(di.tables, bases).items()}
    want = classify_reads_golden(rs.seqs[:n], idx, 0.1)
    np.testing.assert_array_equal(out["taxon"], [r.taxon for r in want])
    np.testing.assert_array_equal(out["best"], [r.best for r in want])
    np.testing.assert_array_equal(out["nvalid"], [r.nvalid for r in want])


def test_q8_sharded_stash_path(world, monkeypatch):
    """Force tiny q8 buckets (PANGEA_Q8_WAYS=4) so per-shard stashes are
    non-empty and shards need different natural bucket counts — the
    common-nb + stash padding machinery must stay bit-exact."""
    from pangea_tpu.index.shard import shard_tables_q8
    from pangea_tpu.kernels.lookup import fuse_stash
    tax, _, idx, rs = world
    out = shard_tables_q8(idx, 4, ways=4, load_factor=2.0)
    assert out is not None
    fused, stash3, nb = out
    assert fused.shape == (4, nb, 8)
    assert sum(int((stash3[s][0] != 0xFFFFFFFF).sum())
               for s in range(4)) > 0, "stash not exercised"
    canon, taxa = extract_pairs(idx)
    hi = (canon >> np.uint64(32)).astype(np.uint32)
    lo = (canon & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    got_in = np.zeros(canon.shape, np.int32)
    got_hit = np.zeros(canon.shape, np.int32)
    for s in range(4):
        stash = fuse_stash(stash3[s], tax.tin, tax.tout)
        h, t_in, _ = map(np.asarray, lookup_q8_jnp(
            jnp.array(hi), jnp.array(lo), jnp.ones(canon.shape, bool),
            jnp.array(fused[s]), jnp.array(stash), k=idx.meta.k, ways=4))
        got_hit += h
        got_in += t_in
    np.testing.assert_array_equal(got_hit, 1)      # disjoint supports
    np.testing.assert_array_equal(got_in, tax.tin[taxa])


def test_q8_streaming_placement_bit_exact(tmp_path, monkeypatch):
    """ShardedIndex on a matching mesh takes the STREAMING q8 placement
    (_place_sharded_streaming_q8) — bit-exact vs the monolithic golden
    and vs the std streaming placement."""
    from pangea_tpu.dist import MeshConfig, make_mesh, place_index
    from pangea_tpu.dist.mesh import batch_sharding, make_sharded_classify_fn
    from pangea_tpu.index import build_index_ooc, load_index_any
    from pangea_tpu.utils import datagen
    tax = datagen.make_taxonomy(seed=11)
    genomes = datagen.make_genomes(tax, genome_len=4000, seed=12)
    build_index_ooc(((g, t) for g, t in genomes), tax, k=21,
                    out=str(tmp_path / "idx"), n_shards=4)
    sidx = load_index_any(str(tmp_path / "idx"))
    rs = datagen.sample_reads(genomes, 64, read_len=110, n_prob=0.02,
                              seed=13)
    mesh = make_mesh(MeshConfig(n_data=2, n_shard=4))
    mono = build_index(genomes, tax, k=21)
    want = classify_reads_golden(rs.seqs, mono, 0.0)
    outs = {}
    for layout in ("q8", "std"):
        monkeypatch.setenv("PANGEA_LAYOUT", layout)
        di = place_index(sidx, mesh, 0.0)
        assert di.cfg.layout == layout
        fn = make_sharded_classify_fn(di.cfg, mesh)
        b = jax.device_put(pad_batch(rs.seqs, 64, 110),
                           batch_sharding(mesh))
        outs[layout] = {k: np.asarray(v)
                        for k, v in fn(di.tables, b).items()}
        np.testing.assert_array_equal(outs[layout]["taxon"],
                                      [r.taxon for r in want])
        np.testing.assert_array_equal(outs[layout]["best"],
                                      [r.best for r in want])
    for k in ("taxon", "best", "nvalid"):
        np.testing.assert_array_equal(outs["q8"][k], outs["std"][k])


# ------------------------------------------------------------------- q12
# Two-lane-remainder quotient layout (VERDICT r3 #3): the k=31 lane.

@pytest.fixture(scope="module")
def world31():
    return small_world(k=31, n_reads=150)


def test_q12_layout_roundtrip_k31(world31):
    """k=31: every stored k-mer found with its exact interval; absent
    62-bit k-mers miss — the bijection argument at the width q8 cannot
    reach."""
    from pangea_tpu.kernels.lookup import (_Q12_WAYS, fuse_stash,
                                           lookup_q12_jnp, q12_layout,
                                           _q12_row_lanes)
    tax, _, idx, _ = world31
    canon, taxa = extract_pairs(idx)
    out = q12_layout(canon, taxa, tax.tin, tax.tout, idx.meta.k)
    assert out is not None
    fusedq, stash3, nb = out
    assert fusedq.shape == (nb, _q12_row_lanes(_Q12_WAYS))
    stash = fuse_stash(stash3, tax.tin, tax.tout)
    rng = np.random.default_rng(2)
    absent = rng.integers(0, 1 << 62, size=5000, dtype=np.uint64)
    absent = absent[~np.isin(absent, canon)]
    qs = np.concatenate([canon, absent])
    hi = (qs >> np.uint64(32)).astype(np.uint32)
    lo = (qs & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hit, t_in, t_out = map(np.asarray, lookup_q12_jnp(
        jnp.array(hi), jnp.array(lo), jnp.ones(qs.shape, bool),
        jnp.array(fusedq), jnp.array(stash), k=idx.meta.k))
    n = canon.shape[0]
    np.testing.assert_array_equal(hit[:n], 1)
    np.testing.assert_array_equal(t_in[:n], tax.tin[taxa])
    np.testing.assert_array_equal(t_out[:n], tax.tout[taxa])
    np.testing.assert_array_equal(hit[n:], 0)


def test_q12_classify_bit_exact(world31):
    """Explicit q12 at k=31 classifies bit-exact vs golden. The AUTO
    policy keeps std for this small (fast-regime) table — measured
    faster there (experiments/mb_q12.py r4: std 2.77 ms vs q12 3.50 ms
    at the config-4 shape); q12 is auto only beyond the fast regime."""
    tax, _, idx, rs = world31
    assert DeviceIndex.from_index(idx).cfg.layout == "std"   # auto
    di = DeviceIndex.from_index(idx, confidence_threshold=0.0,
                                layout="q12")
    assert di.cfg.layout == "q12"
    fn = make_classify_fn(di.cfg)
    bases = pad_batch(rs.seqs, len(rs.seqs), 120)
    out = {k: np.asarray(v) for k, v in fn(di.tables, bases).items()}
    want = classify_reads_golden(rs.seqs, idx, 0.0)
    np.testing.assert_array_equal(out["taxon"], [r.taxon for r in want])
    np.testing.assert_array_equal(out["best"], [r.best for r in want])
    np.testing.assert_array_equal(out["nvalid"], [r.nvalid for r in want])


@pytest.mark.parametrize("shape", [(1, 4), (4, 1)])
def test_q12_sharded_mesh_bit_exact(world31, shape, monkeypatch):
    """Per-shard q12 tables across mesh shapes — bit-exact vs golden
    (forced: the auto policy keeps std for fast-regime tables)."""
    from pangea_tpu.dist import MeshConfig, make_mesh, place_index
    from pangea_tpu.dist.mesh import batch_sharding, make_sharded_classify_fn
    monkeypatch.setenv("PANGEA_LAYOUT", "q12")
    tax, _, idx, rs = world31
    mesh = make_mesh(MeshConfig(*shape), devices=jax.devices()[:4])
    di = place_index(idx, mesh, confidence_threshold=0.1)
    assert di.cfg.layout == "q12" and di.cfg.n_shards == shape[1]
    fn = make_sharded_classify_fn(di.cfg, mesh)
    n = len(rs.seqs) - len(rs.seqs) % shape[0]
    bases = jax.device_put(pad_batch(rs.seqs[:n], n, 120),
                           batch_sharding(mesh))
    out = {k: np.asarray(v) for k, v in fn(di.tables, bases).items()}
    want = classify_reads_golden(rs.seqs[:n], idx, 0.1)
    np.testing.assert_array_equal(out["taxon"], [r.taxon for r in want])
    np.testing.assert_array_equal(out["best"], [r.best for r in want])


def test_multik_fused_q8_plus_q12(world, monkeypatch):
    """Config-4 shape: fused multi-k with MIXED layouts (k=21 via q8,
    k=31 forced q12) in one program, merged on device — bit-exact vs the
    golden multi-k merge."""
    from pangea_tpu.dist import MeshConfig, make_mesh, place_index
    from pangea_tpu.dist.mesh import (batch_sharding,
                                      make_multik_sharded_classify_fn)
    from pangea_tpu.golden import merge_multik_golden
    tax, genomes, idx21, rs = world
    idx31 = build_index(genomes, tax, k=31)
    mesh = make_mesh(MeshConfig(n_data=2, n_shard=1),
                     devices=jax.devices()[:2])
    di21 = place_index(idx21, mesh, 0.0)
    monkeypatch.setenv("PANGEA_LAYOUT", "q12")
    di31 = place_index(idx31, mesh, 0.0)
    monkeypatch.delenv("PANGEA_LAYOUT")
    assert di21.cfg.layout == "q8" and di31.cfg.layout == "q12"
    fn = make_multik_sharded_classify_fn([di21.cfg, di31.cfg], mesh)
    n = len(rs.seqs) - len(rs.seqs) % 2
    b = jax.device_put(pad_batch(rs.seqs[:n], n, 120),
                       batch_sharding(mesh))
    out = {k: np.asarray(v)
           for k, v in fn((di21.tables, di31.tables), b).items()}
    g21 = classify_reads_golden(rs.seqs[:n], idx21, 0.0)
    g31 = classify_reads_golden(rs.seqs[:n], idx31, 0.0)
    want = [merge_multik_golden(a, b_, tax) for a, b_ in zip(g21, g31)]
    np.testing.assert_array_equal(out["taxon"], [r.taxon for r in want])
    np.testing.assert_array_equal(out["best"], [r.best for r in want])


def test_q12_plan_rules():
    from pangea_tpu.index.build import q12_plan
    assert q12_plan(4_000_000, 1, 31, 100) is not None    # the k=31 lane
    assert q12_plan(4_000_000, 1, 21, 100) is None        # q8 covers k=21
    assert q12_plan(4_000_000, 1, 31, 100_000) is None    # stamps > 16 bit
    # In-regime sizes stay std — including 1.05M-2.1M, where only the
    # W=32 std build fits (the W=16-only check handed those to the
    # measured-slower q12; r4 review finding #1).
    assert q12_plan(444_000, 1, 31, 100) is None
    assert q12_plan(2_000_000, 1, 31, 100) is None
    assert q12_plan(40_000_000, 4, 27, 100) is not None  # big k=27 shards


def test_q12_streaming_placement_bit_exact(tmp_path, monkeypatch):
    """k=31 ShardedIndex on a matching mesh takes the streaming q12
    placement (forced: auto keeps std in the fast regime) — bit-exact
    vs the monolithic golden."""
    from pangea_tpu.dist import MeshConfig, make_mesh, place_index
    from pangea_tpu.dist.mesh import batch_sharding, make_sharded_classify_fn
    from pangea_tpu.index import build_index_ooc, load_index_any
    from pangea_tpu.utils import datagen
    monkeypatch.setenv("PANGEA_LAYOUT", "q12")
    tax = datagen.make_taxonomy(seed=21)
    genomes = datagen.make_genomes(tax, genome_len=4000, seed=22)
    build_index_ooc(((g, t) for g, t in genomes), tax, k=31,
                    out=str(tmp_path / "idx31"), n_shards=4)
    sidx = load_index_any(str(tmp_path / "idx31"))
    rs = datagen.sample_reads(genomes, 64, read_len=110, seed=23)
    mesh = make_mesh(MeshConfig(n_data=2, n_shard=4))
    di = place_index(sidx, mesh, 0.0)
    assert di.cfg.layout == "q12"
    fn = make_sharded_classify_fn(di.cfg, mesh)
    b = jax.device_put(pad_batch(rs.seqs, 64, 110), batch_sharding(mesh))
    out = {k: np.asarray(v) for k, v in fn(di.tables, b).items()}
    mono = build_index(genomes, tax, k=31)
    want = classify_reads_golden(rs.seqs, mono, 0.0)
    np.testing.assert_array_equal(out["taxon"], [r.taxon for r in want])
    np.testing.assert_array_equal(out["best"], [r.best for r in want])


@pytest.mark.parametrize("layout", ["q8", "q12"])
def test_chunked_lookup_bit_identical(world, world31, layout, monkeypatch):
    """The chunked gather path (PANGEA_Q8_CHUNK, r4 xprof finding) must
    be bit-identical to the single-shot gather — force a tiny chunk so
    the test batch actually chunks (incl. a padded tail)."""
    tax, _, idx, rs = world if layout == "q8" else world31
    di = DeviceIndex.from_index(idx, confidence_threshold=0.0,
                                layout=layout)
    bases = pad_batch(rs.seqs, len(rs.seqs), 120)
    fn = make_classify_fn(di.cfg)
    monkeypatch.setenv("PANGEA_Q8_CHUNK", "1000")   # forces pad + chunks
    got = {k: np.asarray(v)
           for k, v in make_classify_fn(di.cfg)(di.tables, bases).items()}
    monkeypatch.delenv("PANGEA_Q8_CHUNK")
    want = {k: np.asarray(v) for k, v in fn(di.tables, bases).items()}
    for k in ("taxon", "best", "nvalid"):
        np.testing.assert_array_equal(got[k], want[k])


def test_chunked_std_lookup_bit_identical(world, monkeypatch):
    """The chunked std gather (same r4 materialization fix) must be
    bit-identical to single-shot, including the sharded owner mask."""
    tax, _, idx, rs = world
    di = DeviceIndex.from_index(idx, confidence_threshold=0.0,
                                layout="std")
    bases = pad_batch(rs.seqs, len(rs.seqs), 120)
    want = {k: np.asarray(v)
            for k, v in make_classify_fn(di.cfg)(di.tables, bases).items()}
    monkeypatch.setenv("PANGEA_Q8_CHUNK", "1000")
    got = {k: np.asarray(v)
           for k, v in make_classify_fn(di.cfg)(di.tables, bases).items()}
    for k in ("taxon", "best", "nvalid"):
        np.testing.assert_array_equal(got[k], want[k])


def test_pick_layout_policy():
    """The unified layout decision (r4): q8 wherever sanely exact — the
    round-3 fast-regime cap is retired (q8 measured >= std beyond the
    regime too, mb_shardq8); q12 for the k=31 family beyond the regime;
    std inside it for k=31; explicit requests exactness-gated."""
    from pangea_tpu.index.build import pick_layout
    assert pick_layout(444_302, 1, 21, 100) == "q8"       # headline
    assert pick_layout(28_000_000, 1, 21, 100) == "q8"    # beyond regime
    assert pick_layout(444_302, 1, 31, 100) == "std"      # in-regime k31
    assert pick_layout(28_000_000, 1, 31, 100) == "q12"   # big k31
    assert pick_layout(28_000_000, 1, 21, 100_000) == "std"  # wide stamps
    assert pick_layout(444_302, 1, 21, 100, requested="std") == "std"
    import pytest as _pt
    with _pt.raises(ValueError):
        pick_layout(444_302, 1, 31, 100, requested="q8")  # k31 q8 inexact
    with _pt.raises(ValueError):
        pick_layout(444_302, 1, 21, 100, requested="nope")
