"""Phase breakdown of the classify step on the real chip (honest marginal
timing — utils.timing). Answers: of the ~3.3 ms step at batch 16384 paired
w=8, how much is extraction+minimizer selection, the table-row gather, and
the scorer? Run: PYTHONPATH=src python experiments/mb_phases.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from pangea_tpu.bench import make_bench_world
from pangea_tpu.classify.engine import DeviceIndex, make_classify_fn, pad_batch
from pangea_tpu.index import build_index
from pangea_tpu.kernels import (extract_kmers_jnp, lookup_jnp,
                                score_reads_jnp, select_minimizers_jnp)
from pangea_tpu.utils.timing import fetch_sync, marginal_time

BATCH = 16384
L = 150
W = 8

tax, genomes, idx_dense, rs = make_bench_world()
idx = build_index(genomes, tax, k=21, w=W)
di = DeviceIndex.from_index(idx, confidence_threshold=0.0)
cfg = di.cfg
b1 = jax.device_put(pad_batch(rs.seqs[:BATCH], BATCH, L))
b2 = jax.device_put(pad_batch(rs.mates[:BATCH], BATCH, L))
tables = di.tables


def extract_pair(x, y):
    his, los, vals = [], [], []
    for bb in (x, y):
        hi, lo, valid = extract_kmers_jnp(bb, cfg.k)
        hi, lo, valid = select_minimizers_jnp(hi, lo, valid, cfg.w)
        his.append(hi); los.append(lo); vals.append(valid)
    return (jnp.concatenate(his, 1), jnp.concatenate(los, 1),
            jnp.concatenate(vals, 1))


def timeit(name, step_out_to_state, n_probes=None):
    def make_loop(n):
        def run(state):
            def body(_, st):
                return step_out_to_state(st)
            return jax.lax.fori_loop(0, n, body, state)
        return run
    per, ovh = marginal_time(make_loop, (b1, b2), r=8)
    extra = ""
    if n_probes:
        extra = "  %.1fM rows/s" % (n_probes / per / 1e6)
    print(f"{name:28s} {per*1e3:8.3f} ms  {BATCH/per/1e6:6.2f}M reads/s{extra}")
    return per


hi, lo, valid = jax.jit(extract_pair)(b1, b2)
NPROBE = hi.shape[0] * hi.shape[1]
print("probe tensor:", hi.shape, "=", NPROBE, "rows/step;",
      "fused table:", tables["fused"].shape, tables["fused"].dtype)

# 1. extract + minimize only
def s_extract(st):
    x, y = st
    hi, lo, valid = extract_pair(x, y)
    s = (hi[0, 0] % jnp.uint32(7)).astype(jnp.int32) + 1
    return (jnp.roll(x, s, 0), jnp.roll(y, s, 0))

# 2. + lookup
def s_lookup(st):
    x, y = st
    hi, lo, valid = extract_pair(x, y)
    t, ti, to = lookup_jnp(hi, lo, valid, tables["fused"][0],
                           tables["stash"][0], ways=cfg.ways)
    s = t[0, 0] % jnp.int32(7) + 1
    return (jnp.roll(x, s, 0), jnp.roll(y, s, 0))

# 3. full step
fn = make_classify_fn(cfg, paired=True)
def s_full(st):
    x, y = st
    out = fn(tables, x, y)
    s = out["best"][0] % jnp.int32(7) + 1
    return (jnp.roll(x, s, 0), jnp.roll(y, s, 0))

# 4. raw gather of the same row count from the same table
ridx = jax.device_put(
    np.random.default_rng(0).integers(0, tables["fused"].shape[1],
                                      size=NPROBE).astype(np.int32))
def s_gather(st):
    x, y = st
    rows = tables["fused"][0][(ridx + x[0, 0].astype(jnp.int32))
                              % tables["fused"].shape[1]]
    s = rows[0, 0].astype(jnp.int32) % jnp.int32(7) + 1
    return (jnp.roll(x, s, 0), jnp.roll(y, s, 0))

t_e = timeit("extract+minimize", s_extract)
t_l = timeit("extract+minimize+lookup", s_lookup, NPROBE)
t_f = timeit("FULL step", s_full, NPROBE)
t_g = timeit("raw row gather only", s_gather, NPROBE)
print(f"\nimplied lookup   {1e3*(t_l-t_e):8.3f} ms")
print(f"implied scorer   {1e3*(t_f-t_l):8.3f} ms")
print(f"gather headroom: full step / raw gather = {t_f/t_g:.2f}x")
