"""Deep-regime tiled-gather PREP costs (follow-up to mb_deep.py: tiled
gather wins 2.2x but naive grouping prep ate it). Components measured
separately on the chip, T=16 tiles of 2^16 rows over a [2^20, 128] table:

  - prep_blocked: per-tile slot assignment via 128-deep blocked one-hot
    rank (block sums -> tiny exclusive scan -> within-block cumsum) +
    scatter of local rows into the [T, C] grid
  - scatter_only: just the [N] -> [T*C] scatter
  - unscatter: gather pk results [T*C] -> [N] (the result restore)
  - sort_n: lax.sort of the [N] int32 keys (the alternative grouping)
  - e2e_tiled: prep_blocked + tiled gather + unscatter in ONE program —
    the honest candidate step vs chunk_32768 baseline.

Run: PYTHONPATH=src:/root/.axon_site python experiments/mb_deep2.py
"""
import json

from pangea_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from pangea_tpu.utils.timing import marginal_time

NB = 1 << 20
LANES = 128
N = 524288
TRL = 16                  # log2 tile rows
TR = 1 << TRL
T = NB // TR              # 16 tiles
CAP = 36864               # per-tile capacity (22 sigma over N/T)
BLK = 128                 # rank block depth

key = jax.random.PRNGKey(0)
table = jax.random.bits(key, (NB, LANES), dtype=jnp.uint32)
bnp = np.random.default_rng(1).integers(0, NB, size=N).astype(np.int32)
b = jax.device_put(jnp.asarray(bnp))
out = {}


def timeit(name, step):
    def make_loop(n):
        def run(state):
            def body(i, st):
                acc, x, tab = st
                r = step(x, tab)
                return (acc + r, x ^ (r & jnp.int32(1)), tab)
            return jax.lax.fori_loop(0, n, body, state)
        return run
    per, _ = marginal_time(make_loop, (jnp.int32(0), b, table), r=4)
    out.setdefault(name, []).append(round(per * 1e3, 3))
    print(json.dumps({"case": name, "ms": round(per * 1e3, 3),
                      "ns_per_row": round(per * 1e9 / N, 2)}), flush=True)


def ranks_blocked(x):
    """(pos int32 [N], overflow bool) — slot of probe i in the [T, CAP]
    grid via blocked counting rank (any within-tile order works)."""
    g = (x >> TRL).astype(jnp.int32)                     # [N] tile id
    nb = N // BLK
    ohb = (g.reshape(nb, BLK)[:, :, None]
           == jnp.arange(T, dtype=jnp.int32)[None, None, :])
    bcount = jnp.sum(ohb.astype(jnp.int32), axis=1)      # [nb, T]
    base = jnp.concatenate([jnp.zeros((1, T), jnp.int32),
                            jnp.cumsum(bcount, axis=0)[:-1]])
    within = jnp.cumsum(ohb.astype(jnp.int32), axis=1) - 1
    rank = (jnp.sum(jnp.where(ohb, within + base[:, None, :], 0),
                    axis=2)).reshape(N)
    pos = g * CAP + jnp.minimum(rank, CAP - 1)
    return pos, jnp.any(rank >= CAP)


def prep_blocked(x, tab):
    pos, _ = ranks_blocked(x)
    loc = x & jnp.int32(TR - 1)
    grid = jnp.zeros(T * CAP, jnp.int32).at[pos].set(loc)
    return jnp.sum(grid) & jnp.int32(0x7FFFFFF)


def scatter_only(x, tab):
    pos = x  # N < T*CAP; random-ish positions
    grid = jnp.zeros(T * CAP, jnp.int32).at[pos].set(x)
    return jnp.sum(grid) & jnp.int32(0x7FFFFFF)


def unscatter(x, tab):
    flat = jnp.arange(T * CAP, dtype=jnp.int32)
    return jnp.sum(flat[x]) & jnp.int32(0x7FFFFFF)


def sort_n(x, tab):
    return jnp.sum(jax.lax.sort(x)) & jnp.int32(0x7FFFFFF)


def e2e_tiled(x, tab):
    pos, _over = ranks_blocked(x)
    loc = x & jnp.int32(TR - 1)
    grid = jnp.zeros(T * CAP, jnp.int32).at[pos].set(loc) \
        .reshape(T, CAP)

    def body(args):
        t, rows_idx = args
        tile = jax.lax.dynamic_slice(tab, (t * TR, 0), (TR, LANES))
        tile = jax.lax.optimization_barrier(tile)
        rows = tile[rows_idx]                        # [CAP, LANES]
        return jnp.sum(rows, axis=1, dtype=jnp.uint32)   # per-probe "pk"

    pk = jax.lax.map(body, (jnp.arange(T, dtype=jnp.int32),
                            grid)).reshape(T * CAP)
    mine = pk[pos]                                   # unscatter to [N]
    return jnp.sum(mine, dtype=jnp.uint32).astype(jnp.int32) \
        & jnp.int32(0x7FFFFFF)


def chunk_base(x, tab):
    xs = x.reshape(N // 32768, 32768)
    r = jax.lax.map(
        lambda c: (jnp.sum(tab[c], dtype=jnp.uint32)).astype(jnp.int32),
        xs)
    return jnp.sum(r) & jnp.int32(0x7FFFFFF)


for rnd in range(2):
    timeit("chunk_base", chunk_base)
    timeit("prep_blocked", prep_blocked)
    timeit("scatter_only", scatter_only)
    timeit("unscatter", unscatter)
    timeit("sort_n", sort_n)
    timeit("e2e_tiled", e2e_tiled)
print(json.dumps(out))
with open("docs/artifacts/mb_deep2_r05.json", "w") as fh:
    json.dump(out, fh, indent=2)
