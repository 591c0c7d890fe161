"""Does the gather slow down when its indices are COMPUTED in-program
(round 3)? Isolated q8-geometry cmp+sel runs at ~315M rows/s with stored
indices, but the real lookup phase runs at ~190-220M — this experiment
varies only the index source:

  stored   — indices are a resident device array (the mb_dense3 setup)
  computed — indices derive from stored (hi, lo) via the real q8 hash
  barrier  — computed, with jax.lax.optimization_barrier between the
             index computation and the gather
  computed+extract — indices derive from the REAL extract+minimize chain

Run: PYTHONPATH=src:/root/.axon_site python experiments/mb_idxchain.py
"""
import json

from pangea_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from pangea_tpu.bench import make_bench_world
from pangea_tpu.classify.engine import pad_batch
from pangea_tpu.kernels import extract_kmers_jnp, select_minimizers_jnp
from pangea_tpu.kernels.lookup import _Q8_A, _umulh32_jnp
from pangea_tpu.utils.timing import marginal_time

B, L, K, W8 = 16384, 150, 21, 8
NROWS, RB, W = 16384, 512, 64       # headline-like q8 geometry [2^14x512B]
tax, genomes, idx_dense, rs = make_bench_world()
b1 = jax.device_put(pad_batch(rs.seqs[:B], B, L))
b2 = jax.device_put(pad_batch(rs.mates[:B], B, L))
NP_ = B * 2 * ((L - K + 1) // W8)   # 524288 probes (headline shape)

tab = jax.device_put(np.random.default_rng(0).integers(
    0, 2**32, size=(NROWS, 2 * W), dtype=np.uint32))
ridx = jax.device_put(np.random.default_rng(1).integers(
    0, NROWS, size=NP_).astype(np.int32))
qhi = jax.device_put(np.random.default_rng(2).integers(
    0, 1 << 10, size=NP_, dtype=np.uint32))
qlo = jax.device_put(np.random.default_rng(3).integers(
    0, 2**32, size=NP_, dtype=np.uint32))
out = {}


def q8_idx(hi, lo):
    m = 2 * K
    A = int(_Q8_A)
    h_lo = lo * jnp.uint32(A)
    h_hi = (_umulh32_jnp(lo, A) + hi * jnp.uint32(A)) \
        & jnp.uint32((1 << (m - 32)) - 1)
    r = m - (NROWS.bit_length() - 1)
    rem = h_lo & jnp.uint32((1 << r) - 1)
    b = ((h_hi << jnp.uint32(32 - r)) | (h_lo >> jnp.uint32(r))) \
        .astype(jnp.int32)
    return b, rem


def consume(rows, rem):
    hitlane = rows[:, :W] == rem[:, None]
    pk = jnp.sum(jnp.where(hitlane, rows[:, W:], jnp.uint32(0)), axis=-1)
    return jnp.sum(pk, dtype=jnp.uint32).astype(jnp.int32)


def t(name, body_of_s):
    def make_loop(n):
        def run(state):
            def body(_, s):
                return body_of_s(s) % jnp.int32(7) + s
            return jax.lax.fori_loop(0, n, body, state)
        return run
    per, _ = marginal_time(make_loop, jnp.int32(0), r=8)
    print(f"{name:22s} {per*1e3:7.3f} ms  {NP_/per/1e6:6.1f}M rows/s",
          flush=True)
    out[name] = round(per * 1e3, 3)


def s_stored(s):
    rows = tab[(ridx + s) % jnp.int32(NROWS)]
    rem = qlo & jnp.uint32((1 << 26) - 1)
    return consume(rows, rem)


def s_computed(s):
    b, rem = q8_idx(qhi, qlo + s.astype(jnp.uint32))
    rows = tab[b]
    return consume(rows, rem)


def s_barrier(s):
    b, rem = q8_idx(qhi, qlo + s.astype(jnp.uint32))
    b = jax.lax.optimization_barrier(b)
    rows = tab[b]
    return consume(rows, rem)


def s_extract_chain(s):
    x = jnp.roll(b1, s, 0)
    y = jnp.roll(b2, s, 0)
    hs, ls, vs = [], [], []
    for bb in (x, y):
        hi, lo, valid = extract_kmers_jnp(bb, K)
        hi, lo, valid = select_minimizers_jnp(hi, lo, valid, W8)
        hs.append(hi)
        ls.append(lo)
        vs.append(valid)
    hi = jnp.concatenate(hs, 1).reshape(-1)
    lo = jnp.concatenate(ls, 1).reshape(-1)
    b, rem = q8_idx(hi, lo)
    rows = tab[b]
    return consume(rows, rem)


if __name__ == "__main__":
    print(f"{NP_} probes vs [{NROWS} x {RB}B]", flush=True)
    t("stored-idx", s_stored)
    t("computed-idx", s_computed)
    t("computed+barrier", s_barrier)
    t("real-extract-chain", s_extract_chain)
    with open("/tmp/mb_idxchain.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


def s_extract_chain_barrier(s):
    x = jnp.roll(b1, s, 0)
    y = jnp.roll(b2, s, 0)
    hs, ls = [], []
    for bb in (x, y):
        hi, lo, valid = extract_kmers_jnp(bb, K)
        hi, lo, valid = select_minimizers_jnp(hi, lo, valid, W8)
        hs.append(hi)
        ls.append(lo)
    hi = jnp.concatenate(hs, 1).reshape(-1)
    lo = jnp.concatenate(ls, 1).reshape(-1)
    hi, lo = jax.lax.optimization_barrier((hi, lo))
    b, rem = q8_idx(hi, lo)
    rows = tab[b]
    return consume(rows, rem)


def s_extract_chain_barrier2(s):
    x = jnp.roll(b1, s, 0)
    y = jnp.roll(b2, s, 0)
    hs, ls = [], []
    for bb in (x, y):
        hi, lo, valid = extract_kmers_jnp(bb, K)
        hi, lo, valid = select_minimizers_jnp(hi, lo, valid, W8)
        hs.append(hi)
        ls.append(lo)
    hi = jnp.concatenate(hs, 1).reshape(-1)
    lo = jnp.concatenate(ls, 1).reshape(-1)
    b, rem = q8_idx(hi, lo)
    b, rem = jax.lax.optimization_barrier((b, rem))
    rows = tab[b]
    return consume(rows, rem)
