"""Distributed classify without a cluster (SURVEY.md §5.4): 8 forced host
devices; every mesh shape must match golden bit-exactly."""
import jax
import numpy as np
import pytest

from pangea_tpu.classify.engine import pad_batch
from pangea_tpu.dist import (MeshConfig, choose_mesh, make_mesh,
                             make_sharded_classify_fn, place_index)
from pangea_tpu.dist.mesh import batch_sharding
from pangea_tpu.golden import classify_reads_golden

from .helpers import small_world


@pytest.fixture(scope="module")
def world():
    return small_world(n_reads=128)


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_sharded_classify_bit_exact(world, shape):
    tax, _, idx, rs = world
    mesh = make_mesh(MeshConfig(*shape))
    di = place_index(idx, mesh, confidence_threshold=0.1)
    fn = make_sharded_classify_fn(di.cfg, mesh)
    bases = jax.device_put(pad_batch(rs.seqs, 128, 120),
                           batch_sharding(mesh))
    out = {k: np.asarray(v) for k, v in fn(di.tables, bases).items()}
    want = classify_reads_golden(rs.seqs, idx, 0.1)
    np.testing.assert_array_equal(out["taxon"], [r.taxon for r in want])
    np.testing.assert_array_equal(out["best"], [r.best for r in want])
    np.testing.assert_array_equal(out["nvalid"], [r.nvalid for r in want])


def test_sharded_paired_bit_exact(world):
    tax, genomes, idx, _ = world
    from pangea_tpu.utils import datagen
    rs = datagen.sample_reads(genomes, 64, read_len=110, paired=True,
                              n_prob=0.02, seed=13)
    mesh = make_mesh(MeshConfig(2, 4))
    di = place_index(idx, mesh, confidence_threshold=0.05)
    fn = make_sharded_classify_fn(di.cfg, mesh, paired=True)
    sh = batch_sharding(mesh)
    b1 = jax.device_put(pad_batch(rs.seqs, 64, 110), sh)
    b2 = jax.device_put(pad_batch(rs.mates, 64, 110), sh)
    out = {k: np.asarray(v) for k, v in fn(di.tables, b1, b2).items()}
    want = classify_reads_golden(rs.seqs, idx, 0.05, mates=rs.mates)
    np.testing.assert_array_equal(out["taxon"], [r.taxon for r in want])
    np.testing.assert_array_equal(out["best"], [r.best for r in want])


def test_choose_mesh_policy():
    # tiny index on 8 devices → replicate (shard axis 1)
    assert choose_mesh(8, 1 << 20) == MeshConfig(8, 1)
    # index 4x the budget → shard axis 4
    assert choose_mesh(8, 4 << 30, per_device_hbm_budget=1 << 30) == \
        MeshConfig(2, 4)
    # enormous index → full shard axis
    assert choose_mesh(8, 100 << 30, per_device_hbm_budget=1 << 30) == \
        MeshConfig(1, 8)


def test_make_mesh_device_count():
    with pytest.raises(ValueError):
        make_mesh(MeshConfig(8, 2))
