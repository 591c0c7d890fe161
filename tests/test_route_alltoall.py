"""Exact-capacity all_to_all k-mer routing (round 5, VERDICT r4 #4):
the routed sharded classify must be bit-identical to the broadcast-psum
path and to golden, across mesh shapes, layouts, and BOTH cond branches
(capacity fits → routed; forced overflow → broadcast fallback)."""
import jax
import numpy as np
import pytest

from pangea_tpu.classify.engine import pad_batch
from pangea_tpu.dist import (MeshConfig, make_mesh,
                             make_sharded_classify_fn, place_index)
from pangea_tpu.dist import mesh as M
from pangea_tpu.dist.mesh import batch_sharding
from pangea_tpu.golden import classify_reads_golden

from .helpers import small_world


@pytest.fixture(scope="module")
def world():
    return small_world(n_reads=128)


def _outs(fn, tables, bases):
    return {k: np.asarray(v) for k, v in fn(tables, bases).items()}


@pytest.mark.parametrize("shape", [(2, 4), (1, 8), (4, 2)])
def test_routed_bit_exact(world, shape, monkeypatch):
    tax, _, idx, rs = world
    mesh = make_mesh(MeshConfig(*shape))
    di = place_index(idx, mesh, confidence_threshold=0.1)
    bases = jax.device_put(pad_batch(rs.seqs, 128, 120),
                           batch_sharding(mesh))
    a = _outs(make_sharded_classify_fn(di.cfg, mesh, routing="alltoall"),
              di.tables, bases)
    b = _outs(make_sharded_classify_fn(di.cfg, mesh, routing="broadcast"),
              di.tables, bases)
    for k in ("taxon", "best", "nvalid"):
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    want = classify_reads_golden(rs.seqs, idx, 0.1)
    np.testing.assert_array_equal(a["taxon"], [r.taxon for r in want])


def test_routed_overflow_fallback(world, monkeypatch):
    """cap_frac so small every bin overflows → the in-program guard must
    take the broadcast branch and stay bit-exact."""
    tax, _, idx, rs = world
    mesh = make_mesh(MeshConfig(2, 4))
    di = place_index(idx, mesh, confidence_threshold=0.1)
    bases = jax.device_put(pad_batch(rs.seqs, 128, 120),
                           batch_sharding(mesh))
    orig = M._local_classify_routed
    monkeypatch.setattr(
        M, "_local_classify_routed",
        lambda *a, **kw: orig(*a, **{**kw, "cap_frac": 0.01}))
    a = _outs(make_sharded_classify_fn(di.cfg, mesh, routing="alltoall"),
              di.tables, bases)
    want = classify_reads_golden(rs.seqs, idx, 0.1)
    np.testing.assert_array_equal(a["taxon"], [r.taxon for r in want])


def test_routed_env_flag(world, monkeypatch):
    """PANGEA_ROUTE=alltoall engages routing without code changes."""
    tax, _, idx, rs = world
    monkeypatch.setenv("PANGEA_ROUTE", "alltoall")
    mesh = make_mesh(MeshConfig(1, 8))
    di = place_index(idx, mesh, confidence_threshold=0.0)
    bases = jax.device_put(pad_batch(rs.seqs, 128, 120),
                           batch_sharding(mesh))
    a = _outs(make_sharded_classify_fn(di.cfg, mesh), di.tables, bases)
    want = classify_reads_golden(rs.seqs, idx, 0.0)
    np.testing.assert_array_equal(a["taxon"], [r.taxon for r in want])
