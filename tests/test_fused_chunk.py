"""Fused read-chunk classify (round 5, classify_reads): bit-exactness of
the whole-pipeline lax.map chunking vs the unfused program, on the
single-device step AND under shard_map with the per-chunk psum merge.

The chunk budget is forced tiny (PANGEA_Q8_CHUNK) so small test batches
exercise multiple chunks incl. a padded tail."""
import jax
import numpy as np
import pytest

from pangea_tpu.classify.engine import (DeviceIndex, make_classify_fn,
                                        pad_batch)
from pangea_tpu.dist import (MeshConfig, make_mesh,
                             make_sharded_classify_fn, place_index)
from pangea_tpu.dist.mesh import batch_sharding
from pangea_tpu.golden import classify_reads_golden

from .helpers import small_world


@pytest.fixture(scope="module")
def world():
    return small_world(n_reads=96)


def _run_single(idx, rs, layout, fuse, monkeypatch, paired):
    monkeypatch.setenv("PANGEA_Q8_CHUNK", "1024")   # ~11 reads/chunk
    monkeypatch.setenv("PANGEA_FUSE_CHUNK", "1" if fuse else "0")
    di = DeviceIndex.from_index(idx, confidence_threshold=0.05,
                                layout=layout)
    fn = make_classify_fn(di.cfg, paired=paired)
    b1 = pad_batch(rs.seqs, 96, 120)
    if paired:
        b2 = pad_batch(rs.mates, 96, 120)
        out = fn(di.tables, b1, b2)
    else:
        out = fn(di.tables, b1)
    return {k: np.asarray(v) for k, v in out.items()}


@pytest.mark.parametrize("layout", ["q8", "std"])
def test_fused_chunk_single_device_bit_exact(world, layout, monkeypatch):
    tax, _, idx, rs = world
    a = _run_single(idx, rs, layout, True, monkeypatch, paired=False)
    b = _run_single(idx, rs, layout, False, monkeypatch, paired=False)
    for k in ("taxon", "best", "nvalid"):
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    want = classify_reads_golden(rs.seqs, idx, 0.05)
    np.testing.assert_array_equal(a["taxon"], [r.taxon for r in want])


def test_fused_chunk_paired_bit_exact(world, monkeypatch):
    tax, genomes, idx, _ = world
    from pangea_tpu.utils import datagen
    rs = datagen.sample_reads(genomes, 96, read_len=120, paired=True,
                              n_prob=0.02, seed=7)
    a = _run_single(idx, rs, "q8", True, monkeypatch, paired=True)
    b = _run_single(idx, rs, "q8", False, monkeypatch, paired=True)
    for k in ("taxon", "best", "nvalid"):
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    want = classify_reads_golden(rs.seqs, idx, 0.05, mates=rs.mates)
    np.testing.assert_array_equal(a["taxon"], [r.taxon for r in want])


@pytest.mark.parametrize("shape", [(2, 4), (1, 8)])
def test_fused_chunk_sharded_psum_bit_exact(world, shape, monkeypatch):
    """Per-chunk psum inside the lax.map body must equal the whole-batch
    psum merge, across mesh shapes."""
    tax, _, idx, rs = world
    monkeypatch.setenv("PANGEA_Q8_CHUNK", "1024")
    mesh = make_mesh(MeshConfig(*shape))
    outs = {}
    for fuse in ("1", "0"):
        monkeypatch.setenv("PANGEA_FUSE_CHUNK", fuse)
        di = place_index(idx, mesh, confidence_threshold=0.1)
        fn = make_sharded_classify_fn(di.cfg, mesh)
        bases = jax.device_put(pad_batch(rs.seqs, 96, 120),
                               batch_sharding(mesh))
        outs[fuse] = {k: np.asarray(v)
                      for k, v in fn(di.tables, bases).items()}
    for k in ("taxon", "best", "nvalid"):
        np.testing.assert_array_equal(outs["1"][k], outs["0"][k],
                                      err_msg=k)
    want = classify_reads_golden(rs.seqs, idx, 0.1)
    np.testing.assert_array_equal(outs["1"]["taxon"],
                                  [r.taxon for r in want])
