"""Round-2d: Pallas DMA row-gather, variant bisection (VERDICT r1 #3b).

mb_gather4 proved minimal static and dynamic-start make_async_copy kernels
COMPILE through this tunnel — mb_gather3's full gather kernel hit a Mosaic
internal error for some other construct. Bisect: HBM->HBM copies vs
pipelined-VMEM-output destination, `%` vs `&` slot math, warmup loop vs
pl.when. Measure whatever compiles on the 134 MB / 256 B-row shape where
XLA's gather does 88M rows/s.

Run: PYTHONPATH=src:/root/.axon_site python -u experiments/mb_gather5.py
"""
import sys

sys.path.insert(0, "src")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pangea_tpu.utils.timing import marginal_time

D = 64                       # 256 B rows
NB = (134 * 1024 * 1024) // (4 * D)
NB = 1 << (NB.bit_length() - 1)
NQ = 1 << 19                 # 524k rows per call — enough to measure
rng = np.random.default_rng(0)
table_np = rng.integers(0, 2**32, size=(NB, D), dtype=np.uint32)
print("device:", jax.devices()[0], f" table {NB}x{D} "
      f"({NB*D*4>>20} MB), NQ={NQ}", flush=True)
table_d = jax.device_put(table_np)
idx_d = jax.device_put(rng.integers(0, NB, size=NQ).astype(np.int32))


def variant_hbm2hbm(depth, chunk):
    """DMA table row -> output row, both in HBM (ANY); depth-deep rotation
    with power-of-two & slot math and an explicit warmup loop."""
    assert depth & (depth - 1) == 0

    def kernel(idx_ref, table_ref, out_ref, sems):
        c = pl.program_id(0)
        base = c * chunk

        def dma(j, slot):
            g = base + j
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(idx_ref[g], 1), :],
                out_ref.at[pl.ds(g, 1), :],
                sems.at[slot])

        def warm(j, _):
            dma(j, j & (depth - 1)).start()
            return 0

        jax.lax.fori_loop(0, depth, warm, 0, unroll=True)

        def body(j, _):
            slot = j & (depth - 1)
            dma(j - depth, slot).wait()
            dma(j, slot).start()
            return 0

        jax.lax.fori_loop(depth, chunk, body, 0)

        def drain(j, _):
            dma(j, j & (depth - 1)).wait()
            return 0

        jax.lax.fori_loop(chunk - depth, chunk, drain, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NQ // chunk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))],
    )

    def gather(idx, table):
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((NQ, D), jnp.uint32),
        )(idx, table)
    return gather


def variant_vmem_out(depth, chunk):
    """DMA table row -> pipelined VMEM output block (mb_gather3's shape,
    minus rem/when)."""
    def kernel(idx_ref, table_ref, out_ref, sems):
        c = pl.program_id(0)
        base = c * chunk

        def dma(j, slot):
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(idx_ref[base + j], 1), :],
                out_ref.at[pl.ds(j, 1), :],
                sems.at[slot])

        def warm(j, _):
            dma(j, j & (depth - 1)).start()
            return 0

        jax.lax.fori_loop(0, depth, warm, 0, unroll=True)

        def body(j, _):
            slot = j & (depth - 1)
            dma(j - depth, slot).wait()
            dma(j, slot).start()
            return 0

        jax.lax.fori_loop(depth, chunk, body, 0)

        def drain(j, _):
            dma(j, j & (depth - 1)).wait()
            return 0

        jax.lax.fori_loop(chunk - depth, chunk, drain, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NQ // chunk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((chunk, D), lambda c, idx: (c, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))],
    )

    def gather(idx, table):
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((NQ, D), jnp.uint32),
        )(idx, table)
    return gather


def check_and_time(name, gather):
    try:
        out = np.asarray(gather(idx_d, table_d))
        ok = np.array_equal(out, table_np[np.asarray(idx_d)])
        print(f"{name}: compiles, correct={ok}", flush=True)
        if not ok:
            return

        def make_loop(r):
            def run(ix):
                def body(_, i2):
                    rows = gather(i2, table_d)
                    v = jnp.sum(rows[:, 0].astype(jnp.int32))
                    return (i2 + 1 + v) & (NB - 1)
                return jax.lax.fori_loop(0, r, body, ix)
            return run

        per, _ = marginal_time(make_loop, idx_d, r=2)
        print(f"{name}: {per*1e3:9.3f} ms for {NQ} rows = "
              f"{NQ/per/1e6:7.1f}M rows/s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name} FAILED: {type(e).__name__} {str(e)[:200]}",
              flush=True)


for depth, chunk in ((16, 4096), (64, 8192)):
    check_and_time(f"hbm2hbm d={depth} c={chunk}",
                   variant_hbm2hbm(depth, chunk))
check_and_time("vmem_out d=16 c=4096", variant_vmem_out(16, 4096))
