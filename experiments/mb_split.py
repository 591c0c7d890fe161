"""Two-executable headline step vs the fused one-program step
(VERDICT r3 #5): the r3 finding was ~0.6-0.7 ms/step of in-program
lookup surplus vs the isolated gather at identical geometry, resisting
lax.optimization_barrier. This forces ACTUAL materialization: program 1
(extract → minimize → q8 mix → bucket/rem) writes [N] int32/uint32 to
HBM; program 2 (row gather → lane compare → score) reads them. Two
async dispatches chain on-device; the pair is marginal-timed like one
step. HBM cost of the seam: ~3x [N]x4 B ~= 6 MB/step ~ 8 us at
819 GB/s — noise if the gather regains its isolated rate.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))
sys.path.insert(0, "src")

from pangea_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from pangea_tpu.bench import _batches, _measure, make_bench_world
from pangea_tpu.classify.engine import DeviceIndex, make_classify_fn
from pangea_tpu.index import build_index
from pangea_tpu.kernels import (extract_kmers_jnp, score_reads_tin_jnp,
                                select_minimizers_jnp)
from pangea_tpu.kernels.lookup import _Q8_A, _umulh32_jnp
from pangea_tpu.utils.timing import fetch_sync, marginal_time

BATCH = 16384
READ_LEN = 150
K = 21
W8 = 8


def emit(**kw):
    print(json.dumps(kw), flush=True)


def q8_bucket_rem(hi, lo, valid, nb, k):
    m = 2 * k
    r = m - (nb.bit_length() - 1)
    A = int(_Q8_A)
    h_lo = lo * jnp.uint32(A)
    h_hi = (_umulh32_jnp(lo, A) + hi * jnp.uint32(A)) \
        & jnp.uint32((1 << (m - 32)) - 1)
    rem = h_lo & jnp.uint32((1 << r) - 1)
    b = ((h_hi << jnp.uint32(32 - r)) | (h_lo >> jnp.uint32(r))) \
        .astype(jnp.int32)
    return b, rem


def main():
    tax_, genomes, _idxd, rs = make_bench_world()
    idx = build_index(genomes, tax_, k=K, w=W8)
    di = DeviceIndex.from_index(idx, confidence_threshold=0.0)
    assert di.cfg.layout == "q8"
    d1, d2 = _batches(rs, BATCH, READ_LEN)
    nb = int(di.fused.shape[1])
    ways = di.cfg.ways

    # --- baseline: the fused one-program step -------------------------
    fn = make_classify_fn(di.cfg, paired=True)
    step, csec, out0, _ = _measure(fn, di.tables, d1, d2, rounds=8)
    emit(variant="fused_inloop", step_ms=round(step * 1e3, 3),
         reads_per_sec=round(BATCH / step, 1), compile_sec=round(csec, 1))

    # --- split: program 1 (produce indices) ---------------------------
    def p1(b1, b2):
        his, los, vals = [], [], []
        for bb in (b1, b2):
            hi, lo, valid = extract_kmers_jnp(bb, K)
            hi, lo, valid = select_minimizers_jnp(hi, lo, valid, W8)
            his.append(hi)
            los.append(lo)
            vals.append(valid)
        hi = jnp.concatenate(his, axis=1)
        lo = jnp.concatenate(los, axis=1)
        valid = jnp.concatenate(vals, axis=1)
        b, rem = q8_bucket_rem(hi, lo, valid, nb, K)
        nvalid = jnp.sum(valid.astype(jnp.int32), axis=1)
        return b, rem, valid, nvalid

    def p2(tables, b, rem, valid, nvalid):
        fused = tables["fused"][0]
        rows = fused[b]                           # THE gather, isolated
        hitlane = valid & (rows[..., :ways] == rem[..., None])
        pk = jnp.sum(jnp.where(hitlane, rows[..., ways:], jnp.uint32(0)),
                     axis=-1)
        t_in = (pk >> jnp.uint32(16)).astype(jnp.int32)
        t_out = (pk & jnp.uint32(0xFFFF)).astype(jnp.int32)
        hit = jnp.any(hitlane, axis=-1).astype(jnp.int32)
        return score_reads_tin_jnp((hit, t_in, t_out), nvalid,
                                   tables["tax"], 0.0)

    jp1 = jax.jit(p1)
    jp2 = jax.jit(p2)

    def pair(tables, b1, b2):
        b, rem, valid, nvalid = jp1(b1, b2)
        return jp2(tables, b, rem, valid[..., None], nvalid)

    t0 = time.time()
    out1 = pair(di.tables, d1, d2)
    fetch_sync(out1)
    csec1 = time.time() - t0
    for k in ("taxon", "best", "nvalid"):
        np.testing.assert_array_equal(np.asarray(out1[k]),
                                      np.asarray(out0[k]))

    # Eager dispatch chains (a jitted loop would INLINE jp1/jp2 back into
    # one fused program, un-splitting the split). The device executes
    # programs FIFO, so fetching the last output times the SUM of all
    # chained programs; the constant roll between steps is a tiny
    # program charged identically to both variants. Marginal = (t_2r -
    # t_r) / r.
    jroll = jax.jit(lambda x: jnp.roll(x, 1, axis=0))

    def chain(stepfn, n):
        b1c, b2c = d1, d2
        out = None
        for _ in range(n):
            out = stepfn(di.tables, b1c, b2c)
            b1c = jroll(b1c)
            b2c = jroll(b2c)
        fetch_sync(out)

    def marginal_eager(stepfn, r=16, reps=3):
        chain(stepfn, 2)                       # warm
        tr = min(_timed(chain, stepfn, r) for _ in range(reps))
        t2r = min(_timed(chain, stepfn, 2 * r) for _ in range(reps))
        return (t2r - tr) / r

    def _timed(chainfn, stepfn, n):
        t0 = time.perf_counter()
        chainfn(stepfn, n)
        return time.perf_counter() - t0

    step_f = marginal_eager(lambda t, a, b: fn(t, a, b))
    emit(variant="fused_eager", step_ms=round(step_f * 1e3, 3),
         reads_per_sec=round(BATCH / step_f, 1))
    step2 = marginal_eager(pair)
    emit(variant="split_eager", step_ms=round(step2 * 1e3, 3),
         reads_per_sec=round(BATCH / step2, 1),
         compile_sec=round(csec1, 1),
         parity="split == fused bit-exact")


if __name__ == "__main__":
    main()
