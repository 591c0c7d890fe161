"""Round-2c: fat-row gathers (VERDICT r1 #3/#2 follow-up to mb_gather3).

mb_gather3 found the gather cliff is ROW COUNT, not bytes: ≤2^16 bucket
rows run ~300M rows/s (256 B@17 MB and 512 B@34 MB alike); ≥2^17 rows run
~88M rows/s regardless of row size. If that extends to 1-2 KB rows, the
dense (w=1) parity table (2M k-mers) re-laid at W=64 (1 KB rows, NB=2^16,
67 MB) gathers ~3.4x faster than today's W=16 2^19-row layout.

  A. fat-row sweep: row sizes 1/2/4 KB at NB=2^15..2^16.
  B. element gather (jnp.take) of 4.26M int32 from a small array — the
     scatter-back cost that gates any dedupe scheme.
  C. minimal Pallas make_async_copy kernel — does ANY DMA kernel compile
     through this tunnel's remote compiler?

Run: PYTHONPATH=src:/root/.axon_site python -u experiments/mb_gather4.py
"""
import sys

sys.path.insert(0, "src")

import jax
import jax.numpy as jnp
import numpy as np

from pangea_tpu.utils.timing import marginal_time

N = 4_259_840
rng = np.random.default_rng(0)
print("device:", jax.devices()[0], flush=True)


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
    print(f"{name:42s} {per*1e3:9.3f} ms  {n/per/1e6:7.1f}M rows/s "
          f"{n*table.shape[1]*4/per/1e9:6.1f} GB/s", flush=True)


print("\n=== A: fat rows, NB <= 2^16 ===", flush=True)
for D, nb_log in ((256, 16), (256, 15), (512, 15), (512, 16), (1024, 15)):
    NB = 1 << nb_log
    mb = NB * D * 4 >> 20
    t = jax.device_put(rng.integers(0, 2**32, size=(NB, D),
                                    dtype=np.uint32))
    i0 = jax.device_put(rng.integers(0, NB, size=N).astype(np.int32))
    bench_gather(t, i0, f"D={D:4d} ({D*4:5d} B) NB=2^{nb_log} {mb:5d} MB")
    del t, i0

print("\n=== B: element gather (take) 4.26M from 2M-entry array ===",
      flush=True)
src = jax.device_put(rng.integers(0, 2**31, size=2_000_000,
                                  dtype=np.int32))
idx = jax.device_put(rng.integers(0, 2_000_000, size=N).astype(np.int32))


def make_loop(r):
    def run(ix):
        def body(_, i2):
            v = src[i2]
            return (i2 + 1 + v) % jnp.int32(2_000_000)
        return jax.lax.fori_loop(0, r, body, ix)
    return run


per, _ = marginal_time(make_loop, idx, r=4)
print(f"take 4.26M elems: {per*1e3:.3f} ms = {N/per/1e6:.1f}M elem/s",
      flush=True)

print("\n=== C: minimal Pallas DMA kernel compile probe ===", flush=True)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

try:
    def kernel(x_ref, o_ref, sem):
        dma = pltpu.make_async_copy(x_ref.at[pl.ds(0, 8), :], o_ref, sem)
        dma.start()
        dma.wait()

    x = jnp.arange(16 * 128, dtype=jnp.float32).reshape(16, 128)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )(x)
    ok = np.allclose(np.asarray(out), np.asarray(x[:8]))
    print("minimal static DMA kernel: COMPILES, correct =", ok, flush=True)
except Exception as e:  # noqa: BLE001
    print("minimal static DMA kernel FAILED:", type(e).__name__,
          str(e)[:300], flush=True)

try:
    def kernel2(i_ref, x_ref, o_ref, sem):
        dma = pltpu.make_async_copy(x_ref.at[pl.ds(i_ref[0], 8), :],
                                    o_ref, sem)
        dma.start()
        dma.wait()

    x = jnp.arange(16 * 128, dtype=jnp.float32).reshape(16, 128)
    i = jnp.array([4], dtype=jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((8, 128), lambda c, i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )
    out = pl.pallas_call(
        kernel2, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(i, x)
    ok = np.allclose(np.asarray(out), np.asarray(x[4:12]))
    print("dynamic-start DMA kernel: COMPILES, correct =", ok, flush=True)
except Exception as e:  # noqa: BLE001
    print("dynamic-start DMA kernel FAILED:", type(e).__name__,
          str(e)[:300], flush=True)
