"""Deep-table (>2^17-row) gather regime probes (VERDICT r4 #2).

Questions, each measured in situ on a synthetic q8-geometry table
([2^20, 128] u32 = 512 MB, the 28M-k-mer-shard shape):
  a) chunk-size sweep — _Q8_CHUNK=32768 was tuned in the FAST regime;
     does the latency-bound regime want bigger chunks (more rows in
     flight) or does it not care?
  b) issue parallelism — G independent gather ops per chunk (TPU runs
     HLOs sequentially, so this should NOT help; confirm).
  c) tiled gather — probes grouped per 2^13..2^16-row tile, the tile
     dynamic-sliced out (optimization_barrier pins the copy) and gathered
     from the small operand: does XLA give the small intermediate the
     fast-regime treatment (VMEM residency) the r3 cliff suggests?
  d) the host-side prep cost of the (c) grouping (one-hot rank/scatter),
     measured separately on device.

Run: PYTHONPATH=src:/root/.axon_site python experiments/mb_deep.py
"""
import json
import sys

from pangea_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from pangea_tpu.utils.timing import marginal_time

NB = 1 << 20          # table rows (q8 28M-kmer shard geometry)
LANES = 128           # 512 B rows
N = 524288            # probes per step (headline batch's flat row count)

key = jax.random.PRNGKey(0)
table = jax.random.bits(key, (NB, LANES), dtype=jnp.uint32)
bnp = np.random.default_rng(1).integers(0, NB, size=N).astype(np.int32)
b = jax.device_put(jnp.asarray(bnp))
out = {}


def timeit(name, make_step, payload):
    # table rides the LOOP STATE, never the closure — a closed-over
    # device table is a jaxpr constant and ships in the remote compile
    # payload (tunnel 413s at GB scale; DESIGN.md r4 fact 3).
    def make_loop(n):
        def run(state):
            def body(i, st):
                acc, x, tab = st
                r = make_step(x, tab)
                return (acc + r, x ^ (r & jnp.int32(1)), tab)
            return jax.lax.fori_loop(0, n, body, state)
        return run
    per, _ = marginal_time(make_loop, (jnp.int32(0), payload, table), r=4)
    ns_row = per * 1e9 / N
    out.setdefault(name, []).append(round(ns_row, 2))
    print(json.dumps({"case": name, "ms": round(per * 1e3, 3),
                      "ns_per_row": round(ns_row, 2)}), flush=True)


def consume(rows):
    return jnp.sum(rows, dtype=jnp.uint32).astype(jnp.int32) \
        & jnp.int32(0x7FFFFFF)


# (a) chunk sweep
def chunked(chunk):
    def step(x, tab):
        xs = x.reshape(N // chunk, chunk)
        r = jax.lax.map(lambda c: consume(tab[c]), xs)
        return jnp.sum(r)
    return step


# (b) G parallel gathers per chunk
def split_g(chunk, g):
    def step(x, tab):
        xs = x.reshape(N // chunk, chunk)

        def body(c):
            parts = jnp.split(c, g)
            return sum(consume(tab[p]) for p in parts)
        return jnp.sum(jax.lax.map(body, xs))
    return step


# (c) tiled gather: probes pre-grouped [T, C] (feasibility — grouping
# cost measured separately in (d)); tile t's probes' local rows in
# [0, TR); pad rows point at row 0 (gathered, summed — cost included).
def tiled(tr_log2, cap):
    TR = 1 << tr_log2
    T = NB // TR
    g = bnp >> tr_log2
    loc = (bnp & (TR - 1)).astype(np.int32)
    order = np.argsort(g, kind="stable")
    counts = np.bincount(g, minlength=T)
    if counts.max() > cap:
        print(json.dumps({"case": f"tiled_{tr_log2}_{cap}",
                          "skip": f"overflow {int(counts.max())}"}),
              flush=True)
        return None
    grid = np.zeros((T, cap), np.int32)
    for t in range(T):
        sel = loc[order[counts[:t].sum():counts[:t].sum() + counts[t]]]
        grid[t, :len(sel)] = sel
    gridj = jax.device_put(jnp.asarray(grid))

    def step(grid_in, tab):
        def body(args):
            t, rows_idx = args
            tile = jax.lax.dynamic_slice(tab, (t * TR, 0), (TR, LANES))
            tile = jax.lax.optimization_barrier(tile)
            return consume(tile[rows_idx])
        r = jax.lax.map(body, (jnp.arange(T, dtype=jnp.int32), grid_in))
        return jnp.sum(r)
    return step, gridj


# (d) grouping prep cost: one-hot ranks + scatter into [T, C]
def prep_cost(tr_log2, cap):
    TR = 1 << tr_log2
    T = NB // TR

    def step(x, tab):
        g = (x >> tr_log2).astype(jnp.int32)
        loc = x & jnp.int32(TR - 1)
        oh = (g[:, None] == jnp.arange(T, dtype=jnp.int32)[None, :])
        rank = (jnp.cumsum(oh.astype(jnp.int32), axis=0) - 1)
        rank = jnp.sum(jnp.where(oh, rank, 0), axis=1)
        pos = g * cap + jnp.minimum(rank, cap - 1)
        flat = jnp.zeros(T * cap, jnp.int32).at[pos].set(loc)
        return jnp.sum(flat) & jnp.int32(0x7FFFFFF)
    return step


for rnd in range(2):
    for chunk in (32768, 131072, 524288):
        timeit(f"chunk_{chunk}", chunked(chunk), b)
    timeit("split_g4", split_g(131072, 4), b)
    for trl, cap in ((13, 8192), (14, 12288), (16, 40960)):
        r = tiled(trl, cap)
        if r:
            step, gridj = r
            timeit(f"tiled_2^{trl}_cap{cap}", step, gridj)
    timeit("prep_2^13", prep_cost(13, 8192), b)
print(json.dumps(out))
with open("docs/artifacts/mb_deep_r05.json", "w") as fh:
    json.dump(out, fh, indent=2)
