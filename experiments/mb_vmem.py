"""Kill the gather's HBM materialization (xprof finding, VERDICT r3 #5).

The r4 trace (docs/artifacts/trace_r04) shows the headline step's cost
is NOT the random access itself — the q8 table already lives in VMEM —
but materializing the gathered [N, 128] rows tensor to HBM (268 MB,
942 us) and re-reading it for the lane compare (854 us). Three levers,
measured here at headline geometry (+ the dense config):

  ways — narrower q8 rows (W=32/16) shrink the materialized tensor 2-4x
         while the table stays in the fast-row regime at headline size;
  pk-hit — hit := pk != 0 (exact, bijection) instead of any(hitlane):
         drops a [N, W] pred materialization + reduce (landed in
         kernels/lookup.py before this run);
  chunked scan — lax.map over query chunks so the per-chunk rows tensor
         is small enough for XLA to keep on-chip.

One JSON line per measurement; parity vs the standard path asserted.
"""
import json
import os
import sys

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

BATCH = 16384
READ_LEN = 150
K = 21


def emit(**kw):
    print(json.dumps(kw), flush=True)


def run_cfg(idx, rs, name, ways=None, want=None):
    if ways is not None:
        os.environ["PANGEA_Q8_WAYS"] = str(ways)
    else:
        os.environ.pop("PANGEA_Q8_WAYS", None)
    try:
        di = DeviceIndex.from_index(idx, confidence_threshold=0.0,
                                    layout="q8")
        fn = make_classify_fn(di.cfg, paired=True)
        d1, d2 = _batches(rs, BATCH, READ_LEN)
        step, csec, out, _ = _measure(fn, di.tables, d1, d2, rounds=8)
        got = {k: np.asarray(v) for k, v in out.items()}
        if want is not None:
            for k in ("taxon", "best", "nvalid"):
                np.testing.assert_array_equal(got[k], want[k])
        emit(config=name, ways=di.cfg.ways,
             nb=int(di.fused.shape[1]),
             step_ms=round(step * 1e3, 3),
             reads_per_sec=round(BATCH / step, 1),
             compile_sec=round(csec, 1))
        return got
    finally:
        os.environ.pop("PANGEA_Q8_WAYS", None)


def chunked_fn(di, w_min, chunk=65536):
    """Full classify step with a lax.map-chunked q8 lookup."""
    nb = int(di.fused.shape[1])
    W = di.cfg.ways
    m = 2 * K
    r = m - (nb.bit_length() - 1)
    A = int(_Q8_A)

    def fn(tables, b1, b2):
        his, los, vals = [], [], []
        for bb in (b1, b2):
            hi, lo, valid = extract_kmers_jnp(bb, K)
            hi, lo, valid = select_minimizers_jnp(hi, lo, valid, w_min)
            his.append(hi)
            los.append(lo)
            vals.append(valid)
        hi = jnp.concatenate(his, axis=1)
        lo = jnp.concatenate(los, axis=1)
        valid = jnp.concatenate(vals, axis=1)
        shape = hi.shape
        hi, lo, valid = (x.reshape(-1) for x in (hi, lo, valid))
        h_lo = lo * jnp.uint32(A)
        h_hi = (_umulh32_jnp(lo, A) + hi * jnp.uint32(A)) \
            & jnp.uint32((1 << (m - 32)) - 1)
        rem = h_lo & jnp.uint32((1 << r) - 1)
        b = ((h_hi << jnp.uint32(32 - r)) | (h_lo >> jnp.uint32(r))) \
            .astype(jnp.int32)
        fused = tables["fused"][0]
        N = b.shape[0]
        nch = -(-N // chunk)
        pad = nch * chunk - N

        def prep(x):
            if pad:
                x = jnp.concatenate([x, jnp.zeros(pad, x.dtype)])
            return x.reshape(nch, chunk)

        def one(args):
            bc, remc, vc = args
            rows = fused[bc]
            hitlane = vc[:, None] & (rows[:, :W] == remc[:, None])
            return jnp.sum(jnp.where(hitlane, rows[:, W:],
                                     jnp.uint32(0)), axis=-1)

        pk = jax.lax.map(one, (prep(b), prep(rem),
                               prep(valid))).reshape(-1)[:N]
        t_in = (pk >> jnp.uint32(16)).astype(jnp.int32)
        t_out = (pk & jnp.uint32(0xFFFF)).astype(jnp.int32)
        hit = (pk != jnp.uint32(0)).astype(jnp.int32)
        hits = tuple(x.reshape(shape) for x in (hit, t_in, t_out))
        nvalid = jnp.sum(valid.reshape(shape).astype(jnp.int32), axis=1)
        return score_reads_tin_jnp(hits, nvalid, tables["tax"], 0.0)

    return fn


def main():
    tax, genomes, idx_dense, rs = make_bench_world()
    idx = build_index(genomes, tax, k=K, w=8)

    want = run_cfg(idx, rs, "headline_w8_q8W64", ways=64)
    run_cfg(idx, rs, "headline_w8_q8W32", ways=32, want=want)
    run_cfg(idx, rs, "headline_w8_q8W16", ways=16, want=want)

    # chunked-scan at W=64 and W=16
    for ways, chunk in ((64, 65536), (16, 131072)):
        os.environ["PANGEA_Q8_WAYS"] = str(ways)
        di = DeviceIndex.from_index(idx, confidence_threshold=0.0,
                                    layout="q8")
        os.environ.pop("PANGEA_Q8_WAYS", None)
        fn = chunked_fn(di, 8, chunk=chunk)
        d1, d2 = _batches(rs, BATCH, READ_LEN)
        step, csec, out, _ = _measure(fn, di.tables, d1, d2, rounds=8)
        got = {k: np.asarray(v) for k, v in out.items()}
        for k in ("taxon", "best", "nvalid"):
            np.testing.assert_array_equal(got[k], want[k])
        emit(config=f"headline_chunked_W{ways}_c{chunk}",
             step_ms=round(step * 1e3, 3),
             reads_per_sec=round(BATCH / step, 1),
             compile_sec=round(csec, 1))

    # dense (w=1) parity config: W=64 (current) vs W=32
    wantd = run_cfg(idx_dense, rs, "dense_w1_q8W64", ways=64)
    run_cfg(idx_dense, rs, "dense_w1_q8W32", ways=32, want=wantd)


if __name__ == "__main__":
    main()
