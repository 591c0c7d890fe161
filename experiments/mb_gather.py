"""Microbenchmark: table-row gather strategies on the real TPU chip.

Finds the fastest way to fetch N random rows from an HBM-resident table and
compare each lane against a per-row query — the classify hot op. Guards
against XLA algebraic rewrites by using the real compare-select consumer and
chaining iterations (each iteration's indices depend on the previous output).

Run: python experiments/mb_gather.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "src")


def timeit_chained(step, state, iters=20, warmup=3):
    """step(state) -> state, all on device; chained so XLA can't overlap
    or fold across iterations."""
    s = step(state)
    jax.tree.map(lambda x: x.block_until_ready(), s)
    for _ in range(warmup):
        s = step(s)
    jax.tree.map(lambda x: x.block_until_ready(), s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = step(s)
    jax.tree.map(lambda x: x.block_until_ready(), s)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0])

    TABLE_MB = 48
    for N in (266_240, 2_129_920):
        print(f"\n=== N = {N} random row fetch+compare, table ~{TABLE_MB} MB ===")
        for D in (8, 16, 24, 32, 64, 128):
            NB = (TABLE_MB * 1024 * 1024) // (4 * D)
            NB = 1 << (NB.bit_length() - 1)  # power of 2
            table = jax.device_put(
                rng.integers(0, 2**32, size=(NB, D), dtype=np.uint32))
            q = jax.device_put(
                rng.integers(0, 2**32, size=(N,), dtype=np.uint32))

            @jax.jit
            def step(state, table=table, NB=NB):
                idx, q = state
                rows = table[idx]                        # [N, D] row gather
                hit = rows == q[:, None]                 # real consumer
                v = jnp.where(
                    hit, jax.lax.bitcast_convert_type(rows, jnp.int32),
                    0).sum(axis=-1)
                nidx = (idx + 1 + v) & (NB - 1)          # chain dependency
                return nidx, q

            idx0 = jax.device_put(
                rng.integers(0, NB, size=(N,), dtype=np.int32))
            dt = timeit_chained(step, (idx0, q))
            bytes_moved = N * D * 4
            print(f"  rowD={D:4d} NB=2^{NB.bit_length()-1:2d} "
                  f"t={dt*1e3:8.3f} ms  {N/dt/1e6:8.1f} Mrows/s  "
                  f"{bytes_moved/dt/1e9:7.1f} GB/s")

    print("\n=== chained jax.lax.sort (2×uint32 key + payload) ===")
    for N in (266_240, 2_129_920):
        hi0 = jax.device_put(rng.integers(0, 2**32, size=(N,),
                                          dtype=np.uint32))
        lo0 = jax.device_put(rng.integers(0, 2**32, size=(N,),
                                          dtype=np.uint32))
        pay0 = jax.device_put(np.arange(N, dtype=np.int32))

        @jax.jit
        def sstep(state):
            hi, lo, pay = state
            shi, slo, spay = jax.lax.sort((hi, lo, pay), num_keys=2)
            # chain: permute bits so next sort is fresh work
            return (slo ^ jnp.uint32(0x9E3779B9), shi, spay)

        dt = timeit_chained(sstep, (hi0, lo0, pay0), iters=5, warmup=2)
        print(f"  N={N:9d} sort t={dt*1e3:8.3f} ms  {N/dt/1e6:6.1f} Mkeys/s")

    print("\n=== row gather+compare vs table size (D=32) ===")
    N = 2_129_920
    for mb in (1, 4, 12, 48, 192, 768):
        D = 32
        NB = (mb * 1024 * 1024) // (4 * D)
        NB = 1 << (NB.bit_length() - 1)
        table = jax.device_put(
            rng.integers(0, 2**32, size=(NB, D), dtype=np.uint32))
        q = jax.device_put(rng.integers(0, 2**32, size=(N,), dtype=np.uint32))

        @jax.jit
        def step(state, table=table, NB=NB):
            idx, q = state
            rows = table[idx]
            hit = rows == q[:, None]
            v = jnp.where(hit, jax.lax.bitcast_convert_type(rows, jnp.int32),
                          0).sum(axis=-1)
            return (idx + 1 + v) & (NB - 1), q

        idx0 = jax.device_put(rng.integers(0, NB, size=(N,), dtype=np.int32))
        dt = timeit_chained(step, (idx0, q))
        print(f"  table={mb:4d} MB NB=2^{NB.bit_length()-1:2d} "
              f"t={dt*1e3:8.3f} ms  {N/dt/1e6:8.1f} Mrows/s  "
              f"{N*D*4/dt/1e9:7.1f} GB/s")


if __name__ == "__main__":
    main()
