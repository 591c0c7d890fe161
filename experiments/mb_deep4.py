"""Sorted-sliced vs plain deep gather at BIG table sizes (config-3
geometry check): at nb >> probes the per-chunk tile copies amplify
(copy bytes/probe = slice_bytes / chunk = 2^shift * nb / N), so the win
measured at nb=2^20 may not survive nb=2^24. Measures plain vs sorted at
slice 2^14/2^15 for nb in {2^22, 2^24}, N = 8.4M (config-3 batch scale).

Run: PYTHONPATH=src:/root/.axon_site python experiments/mb_deep4.py
"""
import json

from pangea_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from pangea_tpu.utils.timing import marginal_time

import os as _os
LANES = 128
N = int(_os.environ.get('DN', 8388608))
out = {}


def timeit(name, step, payload, table):
    def make_loop(n):
        # tab rides the INPUT state only and is NOT in the output — an
        # output copy of an 8.6 GB table OOMs the chip (r5: the nb=2^24
        # compile-helper crash was exactly this).
        def run(state):
            acc0, x0, tab = state
            def body(i, st):
                acc, x = st
                r = step(x, tab)
                return (acc + r, x ^ (r & jnp.int32(1)))
            return jax.lax.fori_loop(0, n, body, (acc0, x0))
        return run
    per, _ = marginal_time(make_loop, (jnp.int32(0), payload, table), r=2)
    out.setdefault(name, []).append(round(per * 1e3, 3))
    print(json.dumps({"case": name, "ms": round(per * 1e3, 3),
                      "ns_per_row": round(per * 1e9 / N, 2)}), flush=True)


def plain(chunk):
    def step(x, tab):
        xs = x.reshape(N // chunk, chunk)
        r = jax.lax.map(
            lambda c: jnp.sum(tab[c], dtype=jnp.uint32), xs)
        return jnp.sum(r).astype(jnp.int32) & jnp.int32(0x7FFFFFF)
    return step


def sorted_sliced(chunk, sl, nb):
    def step(x, tab):
        idx = jnp.arange(N, dtype=jnp.int32)
        sb, sidx = jax.lax.sort((x, idx), num_keys=1)
        nch = N // chunk
        sb2 = sb.reshape(nch, chunk)

        def body(args):
            first, bc = args
            start = jnp.clip(first, 0, jnp.int32(nb - sl))
            tile = jax.lax.dynamic_slice(tab, (start, 0), (sl, LANES))
            tile = jax.lax.optimization_barrier(tile)
            return jnp.sum(tile[bc - start], axis=1, dtype=jnp.uint32)

        pk = jax.lax.map(body, (sb2[:, 0], sb2)).reshape(N)
        _, pk_o = jax.lax.sort((sidx, pk), num_keys=1)
        return jnp.sum(pk_o).astype(jnp.int32) & jnp.int32(0x7FFFFFF)
    return step


rng = np.random.default_rng(1)
import os
for nbl in [int(x) for x in os.environ.get('NBL', '22,24').split(',')]:
    NB = 1 << nbl
    # Generate at most 2^22 random rows and tile: random.bits at 2^24
    # rows peaks ~2x table bytes and OOMs the 16 GB chip; row content is
    # irrelevant to gather timing, only the operand SIZE matters.
    base_rows = min(NB, 1 << 22)
    blk = jax.random.bits(jax.random.PRNGKey(0), (base_rows, LANES),
                          dtype=jnp.uint32)
    table = (blk if base_rows == NB else
             jnp.concatenate([blk] * (NB // base_rows), axis=0))
    del blk
    bnp = rng.integers(0, NB, size=N).astype(np.int32)
    bj = jax.device_put(jnp.asarray(bnp))
    for rnd in range(2):
        timeit(f"plain_nb2^{nbl}", plain(32768), bj, table)
        for sll in (14, 15):
            sl = 1 << sll
            chunk = max(N * (sl // 2) // NB, 2048)
            chunk = 1 << (chunk.bit_length() - 1)
            sb = np.sort(bnp)
            span = (sb.reshape(N // chunk, chunk)[:, -1]
                    - sb.reshape(N // chunk, chunk)[:, 0]).max()
            if span >= sl:
                print(json.dumps({"case": f"sorted_sl2^{sll}_nb2^{nbl}",
                                  "skip": f"span {int(span)}"}), flush=True)
                continue
            timeit(f"sorted_sl2^{sll}_nb2^{nbl}",
                   sorted_sliced(chunk, sl, NB), bj, table)
    del table
print(json.dumps(out))
with open("docs/artifacts/mb_deep4_r05.json", "w") as fh:
    json.dump(out, fh, indent=2)
