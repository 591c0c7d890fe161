"""Round-2b attack on the lookup ceiling (VERDICT r1 #3), continuing
mb_gather2 (whose results: at fixed 134 MB, 256 B rows are optimal —
88M rows/s = 22.5 GB/s; locality free; Pallas kernel failed to compile).

  A. Gather rate vs TABLE SIZE at 256 B and 512 B rows — map the cliff
     curve. (If a 67 MB table gathers much faster than 134 MB, the dense
     parity index should re-lay at W=32: same slots, half the buckets.)
  B. Pallas per-row DMA gather, fixed (2-D slices, scalar-prefetched
     indices, DMA straight into the output block, DEPTH-deep rotation).
  C. Probe-dedupe cost floor: lax.sort of the query hash vector alone,
     at headline (557k) and dense (4.26M) query counts — if the sort
     alone exceeds the whole gather, dedupe is dead on arrival.

Run: PYTHONPATH=src:/root/.axon_site python -u experiments/mb_gather3.py
"""
import sys

sys.path.insert(0, "src")

import jax
import jax.numpy as jnp
import numpy as np

from pangea_tpu.utils.timing import marginal_time

N = 4_259_840
rng = np.random.default_rng(0)
print("device:", jax.devices()[0], " N =", N, flush=True)


def bench_gather(table, idx0, name, n=N):
    NB = table.shape[0]

    def make_loop(r):
        def run(idx):
            def body(_, ix):
                rows = table[ix]
                v = jnp.sum(jnp.where(rows == rows[:, :1],
                                      jax.lax.bitcast_convert_type(
                                          rows, jnp.int32), 0), axis=-1)
                return (ix + 1 + v) & (NB - 1)
            return jax.lax.fori_loop(0, r, body, idx)
        return run

    per, _ = marginal_time(make_loop, idx0, r=4)
    print(f"{name:40s} {per*1e3:9.3f} ms  {n/per/1e6:7.1f}M rows/s "
          f"{n*table.shape[1]*4/per/1e9:6.1f} GB/s", flush=True)
    return n / per


# --- A: size sweep at 256 B and 512 B rows -------------------------------
print("\n=== A: table-size sweep ===", flush=True)
for D in (64, 128):
    for mb in (17, 34, 67, 134):
        NB = (mb * 1024 * 1024) // (4 * D)
        NB = 1 << (NB.bit_length() - 1)
        t = jax.device_put(rng.integers(0, 2**32, size=(NB, D),
                                        dtype=np.uint32))
        i0 = jax.device_put(rng.integers(0, NB, size=N).astype(np.int32))
        bench_gather(t, i0, f"D={D:3d} ({D*4:3d} B) {mb:4d} MB NB=2^"
                     f"{NB.bit_length()-1}")
        del t, i0

# --- C: dedupe floor — sort cost alone -----------------------------------
print("\n=== C: lax.sort cost (dedupe floor) ===", flush=True)
for n in (557_056, N):
    keys = jax.device_put(rng.integers(0, 2**32, size=n, dtype=np.uint32))

    def make_loop(r, keys=keys, n=n):
        def run(k):
            def body(_, kk):
                s = jax.lax.sort(kk)
                return kk ^ s[:1]          # data-dep, cheap
            return jax.lax.fori_loop(0, r, body, k)
        return run

    per, _ = marginal_time(make_loop, keys, r=2)
    print(f"sort {n:9d} u32: {per*1e3:9.3f} ms", flush=True)

# --- B: Pallas DMA gather, fixed ------------------------------------------
print("\n=== B: Pallas DMA row gather ===", flush=True)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 64
NB = (134 * 1024 * 1024) // (4 * D)
NB = 1 << (NB.bit_length() - 1)
table_np = rng.integers(0, 2**32, size=(NB, D), dtype=np.uint32)
NP_Q = 1 << 20
idx_np = rng.integers(0, NB, size=NP_Q).astype(np.int32)


def make_pallas_gather(depth, chunk):
    def kernel(idx_ref, table_ref, out_ref, sems):
        c = pl.program_id(0)
        base = c * chunk

        def dma(j, slot):
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(idx_ref[base + j], 1), :],
                out_ref.at[pl.ds(j, 1), :],
                sems.at[slot])

        def body(j, _):
            slot = jax.lax.rem(j, depth)

            @pl.when(j >= depth)
            def _():
                dma(j - depth, slot).wait()
            dma(j, slot).start()
            return 0

        jax.lax.fori_loop(0, chunk, body, 0, unroll=False)

        def drain(j, _):
            dma(j, jax.lax.rem(j, depth)).wait()
            return 0

        jax.lax.fori_loop(chunk - depth, chunk, drain, 0, unroll=False)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NP_Q // chunk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],   # table in HBM
        out_specs=pl.BlockSpec((chunk, D), lambda c, idx: (c, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))],
    )

    def gather(idx, table):
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((NP_Q, D), jnp.uint32),
        )(idx, table)
    return gather


table_d = jax.device_put(table_np)
idx_d = jax.device_put(idx_np)
for depth, chunk in ((8, 4096), (16, 4096), (32, 8192)):
    try:
        g = make_pallas_gather(depth, chunk)

        def make_loop(r, g=g):
            def run(ix):
                def body(_, i2):
                    rows = g(i2, table_d)
                    v = jnp.sum(rows[:, 0].astype(jnp.int32))
                    return (i2 + 1 + v) & (NB - 1)
                return jax.lax.fori_loop(0, r, body, ix)
            return run

        per, _ = marginal_time(make_loop, idx_d, r=2)
        print(f"pallas depth={depth} chunk={chunk}: {per*1e3:9.3f} ms "
              f"for {NP_Q} rows = {NP_Q/per/1e6:7.1f}M rows/s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"pallas depth={depth} chunk={chunk} FAILED:",
              type(e).__name__, str(e)[:300], flush=True)
