"""A/B: reverse-free rc extraction vs the r4 reversed-slice formulation.

Interleaved marginal timings in ONE process (tunnel weather immune):
(a) full classify step with the shipped (reverse-free) extraction,
(b) extraction-only, both formulations.

Run: PYTHONPATH=src:/root/.axon_site python experiments/mb_rc.py
"""
import json

from pangea_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from pangea_tpu.bench import make_bench_world
from pangea_tpu.classify.engine import DeviceIndex, make_classify_fn, pad_batch
from pangea_tpu.kernels import extract_kmers_jnp
from pangea_tpu.kernels.encode import (_compose, _merge_levels,
                                       _merge_levels_rc, _pieces)
from pangea_tpu.index import build_index
from pangea_tpu.utils.timing import marginal_time

BATCH = 16384
L = 150
K = 21

tax, genomes, idx_dense, rs = make_bench_world()
idx = build_index(genomes, tax, k=K, w=8)
b1 = jax.device_put(pad_batch(rs.seqs[:BATCH], BATCH, L))
b2 = jax.device_put(pad_batch(rs.mates[:BATCH], BATCH, L))


def extract_old(bases, k):
    """The r4 reversed-slice rc formulation, verbatim."""
    codes = bases.astype(jnp.uint32)
    bad = (codes > 3).astype(jnp.uint32)
    c2 = codes & jnp.uint32(3)
    B, Ln = c2.shape
    P = Ln - k + 1
    max_level = 1
    while max_level * 2 <= k:
        max_level *= 2
    mf = _merge_levels(c2, max_level)
    f_hi, f_lo = _compose(mf, k, P)
    mr = _merge_levels((jnp.uint32(3) - c2)[:, ::-1], max_level)
    r_hi, r_lo = _compose(mr, k, P)
    r_hi = r_hi[:, ::-1]
    r_lo = r_lo[:, ::-1]
    fwd_le = (f_hi < r_hi) | ((f_hi == r_hi) & (f_lo <= r_lo))
    hi = jnp.where(fwd_le, f_hi, r_hi)
    lo = jnp.where(fwd_le, f_lo, r_lo)
    return hi, lo


def time_fn(step):
    def make_loop(n):
        def run(state):
            def body(_, st):
                x, y = st
                o = step(x, y)
                s = o % jnp.int32(7) + jnp.int32(1)
                return (jnp.roll(x, s, 0), jnp.roll(y, s, 0))
            return jax.lax.fori_loop(0, n, body, state)
        return run
    per, _ = marginal_time(make_loop, (b1, b2), r=8)
    return per


def ex_new(x, y):
    h1, l1, _ = extract_kmers_jnp(x, K)
    h2, l2, _ = extract_kmers_jnp(y, K)
    return (jnp.sum(h1 ^ l1) + jnp.sum(h2 ^ l2)).astype(jnp.int32) \
        & jnp.int32(0x7FFFFFFF)


def ex_old(x, y):
    h1, l1 = extract_old(x, K)
    h2, l2 = extract_old(y, K)
    return (jnp.sum(h1 ^ l1) + jnp.sum(h2 ^ l2)).astype(jnp.int32) \
        & jnp.int32(0x7FFFFFFF)


di = DeviceIndex.from_index(idx, confidence_threshold=0.0)
fn = make_classify_fn(di.cfg, paired=True)
tables = di.tables


def full_step(x, y):
    o = fn(tables, x, y)
    return o["best"][0]


out = {}
# Interleave 3 rounds of each so drift can't masquerade as a win.
for rnd in range(3):
    for name, f in (("extract_new", ex_new), ("extract_old", ex_old),
                    ("full_step", full_step)):
        out.setdefault(name, []).append(round(time_fn(f) * 1e3, 3))
        print(rnd, name, out[name][-1], flush=True)
print(json.dumps(out))
with open("docs/artifacts/mb_rc_r05.json", "w") as fh:
    json.dump(out, fh, indent=2)
