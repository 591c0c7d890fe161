"""Round-2 attack on the lookup ceiling (VERDICT r1 #3), honest marginal
timing. The dense (w=1) parity config gathers 4.26M rows/step from a 134 MB
table at only ~73M rows/s (mb_score.py) vs ~200-240M rows/s on small
tables. Questions:

  A. At FIXED table bytes, does trading height for row width help?
     (wide rows -> fewer buckets -> shorter table; fact 1 said per-row
     cost is flat across power-of-two row sizes 256/512 B)
  B. Does index locality help on BIG tables? (fact 1 said "locality does
     not help" — measured on small tables; big-table degradation could be
     a page/TLB effect that sorting would fix)
  C. Pallas double-buffered per-row DMA (16-deep rotating buffer, the
     serious version of fact 5's single attempt).

Run: PYTHONPATH=src python -u experiments/mb_gather2.py
"""
import sys

sys.path.insert(0, "src")

import jax
import jax.numpy as jnp
import numpy as np

from pangea_tpu.utils.timing import marginal_time

N = 4_259_840          # dense-config probes/step (B=16384, P=260)
rng = np.random.default_rng(0)
print("device:", jax.devices()[0], " N =", N)


def bench_gather(table, idx0, name, n=N):
    NB = table.shape[0]

    def make_loop(r):
        def run(state):
            def body(_, st):
                idx = st
                rows = table[idx]
                v = jnp.sum(jnp.where(rows == rows[:, :1],
                                      jax.lax.bitcast_convert_type(
                                          rows, jnp.int32), 0), axis=-1)
                return (idx + 1 + v) & (NB - 1)
            return jax.lax.fori_loop(0, r, body, state)
        return run

    per, _ = marginal_time(make_loop, idx0, r=4)
    rate = n / per / 1e6
    gbs = n * table.shape[1] * 4 / per / 1e9
    print(f"{name:44s} {per * 1e3:9.3f} ms  {rate:7.1f}M rows/s "
          f"{gbs:6.1f} GB/s")
    return per


# --- A: fixed 134 MB, sweep row width ------------------------------------
print("\n=== A: fixed ~134 MB table, row width sweep ===")
for D in (16, 32, 64, 128, 256):
    NB = (134 * 1024 * 1024) // (4 * D)
    NB = 1 << (NB.bit_length() - 1)
    table = jax.device_put(rng.integers(0, 2**32, size=(NB, D),
                                        dtype=np.uint32))
    idx0 = jax.device_put(rng.integers(0, NB, size=N).astype(np.int32))
    bench_gather(table, idx0,
                 f"D={D:3d} ({D*4:4d} B rows) NB=2^{NB.bit_length()-1}")
    del table, idx0

# --- B: locality on a big table ------------------------------------------
print("\n=== B: random vs sorted indices, 134 MB, D=64 ===")
D = 64
NB = (134 * 1024 * 1024) // (4 * D)
NB = 1 << (NB.bit_length() - 1)
table = jax.device_put(rng.integers(0, 2**32, size=(NB, D),
                                    dtype=np.uint32))
ridx = rng.integers(0, NB, size=N).astype(np.int32)
bench_gather(table, jax.device_put(ridx), "random idx")
bench_gather(table, jax.device_put(np.sort(ridx)), "sorted idx")
# block-local: random within 2^14-row windows (simulates partial sort)
blk = (np.arange(N, dtype=np.int64) * NB // N).astype(np.int32)
loc = ((blk & ~0x3FFF) | rng.integers(0, 0x4000, size=N)).astype(np.int32) \
    & (NB - 1)
bench_gather(table, jax.device_put(loc), "block-local idx (16k-row windows)")
del table

# --- C: Pallas double-buffered per-row DMA gather -------------------------
print("\n=== C: Pallas DMA gather, 16-deep pipeline, 134 MB, D=64 ===")
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEPTH = 16
CHUNK = 512            # indices per grid step (SMEM block)


def gather_kernel(idx_ref, table_ref, out_ref, scratch, sems):
    def body(i, _):
        slot = i % DEPTH
        # wait for the previous use of this slot before reissuing
        @pl.when(i >= DEPTH)
        def _():
            pltpu.make_async_copy(
                table_ref.at[idx_ref[i - DEPTH]], scratch.at[slot],
                sems.at[slot]).wait()
            out_ref[i - DEPTH, :] = scratch[slot]
        pltpu.make_async_copy(table_ref.at[idx_ref[i]], scratch.at[slot],
                              sems.at[slot]).start()
        return 0

    jax.lax.fori_loop(0, CHUNK, body, 0)

    def drain(i, _):
        slot = i % DEPTH
        pltpu.make_async_copy(table_ref.at[idx_ref[i]], scratch.at[slot],
                              sems.at[slot]).wait()
        out_ref[i, :] = scratch[slot]
        return 0

    jax.lax.fori_loop(CHUNK - DEPTH, CHUNK, drain, 0)


def pallas_gather(idx, table):
    n = idx.shape[0]
    grid = n // CHUNK
    return pl.pallas_call(
        gather_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),     # table stays in HBM
        ],
        out_specs=pl.BlockSpec((CHUNK, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, D), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((DEPTH, D), jnp.uint32),
                        pltpu.SemaphoreType.DMA((DEPTH,))],
    )(idx, table)


NP_SMALL = 1 << 20     # 1M rows is plenty to measure issue rate
table_p = jax.device_put(rng.integers(0, 2**32, size=(NB, D),
                                      dtype=np.uint32))
idxp = jax.device_put(rng.integers(0, NB, size=NP_SMALL).astype(np.int32))


def make_loop_pallas(r):
    def run(idx):
        def body(_, ix):
            rows = pallas_gather(ix, table_p)
            v = jnp.sum(rows[:, 0].astype(jnp.int32))
            return (ix + 1 + v) & (NB - 1)
        return jax.lax.fori_loop(0, r, body, idx)
    return run


try:
    per, _ = marginal_time(make_loop_pallas, idxp, r=2)
    print(f"pallas 16-deep DMA gather: {per*1e3:9.3f} ms for {NP_SMALL} "
          f"rows = {NP_SMALL/per/1e6:7.1f}M rows/s")
except Exception as e:  # noqa: BLE001
    print("pallas gather failed:", type(e).__name__, str(e)[:500])
