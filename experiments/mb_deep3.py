"""Sorted-sliced deep gather, end-to-end candidate (follow-up to
mb_deep2: 1-D lax.sort is cheap, scatters are not — so group probes by
sorting, gather from a dynamic 2^17-row table slice per sorted chunk,
restore by a second sort on the original index).

Measures, at N = 524288 and N = 4M probes on a [2^20, 128] table:
  - base: shipped chunked gather (32768/chunk)
  - sorted_sliced: 2-operand sort (bucket, idx) + per-chunk
    dynamic_slice+local gather + restore sort (idx, pk) — the span
    guard's cond fallback excluded (measured separately as span_ok rate)
  - sort4: the 4-operand sort alone (bucket, rem, rem2, idx)

Run: PYTHONPATH=src:/root/.axon_site python experiments/mb_deep3.py
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
import os
SLICE = 1 << int(os.environ.get('DSL', '17'))

key = jax.random.PRNGKey(0)
table = jax.random.bits(key, (NB, LANES), dtype=jnp.uint32)
out = {}


def timeit(name, step, payload):
    def make_loop(n):
        def run(state):
            def body(i, st):
                acc, x, tab = st
                r = step(x, tab)
                return (acc + r, x ^ (r & jnp.int32(1)), tab)
            return jax.lax.fori_loop(0, n, body, state)
        return run
    per, _ = marginal_time(make_loop, (jnp.int32(0), payload, table), r=4)
    N = payload.shape[0]
    out.setdefault(name, []).append(round(per * 1e3, 3))
    print(json.dumps({"case": name, "ms": round(per * 1e3, 3),
                      "ns_per_row": round(per * 1e9 / N, 2)}), flush=True)


def base(chunk):
    def step(x, tab):
        xs = x.reshape(x.shape[0] // chunk, chunk)
        r = jax.lax.map(
            lambda c: jnp.sum(tab[c], dtype=jnp.uint32), xs)
        return jnp.sum(r).astype(jnp.int32) & jnp.int32(0x7FFFFFF)
    return step


def sorted_sliced(chunk):
    def step(x, tab):
        N = x.shape[0]
        idx = jnp.arange(N, dtype=jnp.int32)
        sb, sidx = jax.lax.sort((x, idx), num_keys=1)
        nch = N // chunk
        firsts = sb.reshape(nch, chunk)[:, 0]

        def body(args):
            first, bc = args
            start = jnp.minimum(first, jnp.int32(NB - SLICE))
            tile = jax.lax.dynamic_slice(tab, (start, 0), (SLICE, LANES))
            tile = jax.lax.optimization_barrier(tile)
            rows = tile[bc - start]
            return jnp.sum(rows, axis=1, dtype=jnp.uint32)  # "pk" [chunk]

        pk = jax.lax.map(body, (firsts, sb.reshape(nch, chunk))) \
            .reshape(N)
        _, pk_orig = jax.lax.sort((sidx, pk), num_keys=1)
        return jnp.sum(pk_orig).astype(jnp.int32) & jnp.int32(0x7FFFFFF)
    return step


def sort4(x, tab):
    N = x.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    r1 = x * jnp.int32(7)
    r2 = x ^ jnp.int32(123)
    sb, a, b2, c = jax.lax.sort((x, r1, r2, idx), num_keys=1)
    return (jnp.sum(sb) + jnp.sum(a) + jnp.sum(b2) + jnp.sum(c)) \
        & jnp.int32(0x7FFFFFF)


rng = np.random.default_rng(1)
import os
CH = int(os.environ.get('DCH', '0'))
for N, chunk in ((524288, CH or 32768), (4194304, (CH * 8) if CH else 262144)):
    bnp = rng.integers(0, NB, size=N).astype(np.int32)
    bj = jax.device_put(jnp.asarray(bnp))
    # span sanity on the host: how tight is the guard?
    sb = np.sort(bnp)
    spans = sb.reshape(N // chunk, chunk)
    print(json.dumps({"N": N, "chunk": chunk,
                      "max_span": int((spans[:, -1] - spans[:, 0]).max()),
                      "slice": SLICE}), flush=True)
    for rnd in range(2):
        timeit(f"base_N{N}", base(32768), bj)
        timeit(f"sorted_sliced_N{N}", sorted_sliced(chunk), bj)
        timeit(f"sort4_N{N}", sort4, bj)
print(json.dumps(out))
with open("docs/artifacts/mb_deep3_r05.json", "w") as fh:
    json.dump(out, fh, indent=2)
