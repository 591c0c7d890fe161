"""Pallas lookup-kernel candidates vs the XLA gather (VERDICT r3 #5).

The headline q8 table (444k k-mers, w=8 production config) is 8.4 MB —
it FITS IN VMEM. If a Pallas kernel can keep it resident and service
row lookups from VMEM, the HBM random-gather (1.7 ms of the 2.7 ms
step — DESIGN fact 5) disappears from the critical path entirely.

Variants, measured at exact headline geometry (N = 524288 queries,
[16384, 128] uint32 q8 table):

  xla   — jnp baseline: fused[b] row gather + rem compare (what the
          engine runs today, isolated).
  take  — Pallas, full table resident in VMEM, queries tiled over the
          grid; rows via jnp.take(table, idx, axis=0) inside the kernel
          (tests Mosaic's dynamic-gather lowering).
  oneh  — Pallas, table resident, gather-free: rows via one-hot MXU
          matmul per query tile (known-cost fallback; predicted ~11 ms
          at this NB — included to calibrate the MXU alternative).

Each variant returns the per-query packed payload (pk) so work cannot
be elided; results are checked equal to the XLA baseline.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))
sys.path.insert(0, "src")

from pangea_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pangea_tpu.utils.timing import fetch_sync, marginal_time

NB = 16384
LANES = 128          # q8 W=64: 64 rem + 64 pk lanes
W = 64
N = 524288           # headline positions per step (16384 reads x 32)
QT = 2048            # queries per grid step (pallas variants)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def make_world(seed=0):
    rng = np.random.default_rng(seed)
    table = rng.integers(0, 2**32, size=(NB, LANES), dtype=np.uint32)
    b = rng.integers(0, NB, size=N, dtype=np.int32)
    # make ~half the queries hit lane (i % W): copy rem into the query
    rem = rng.integers(0, 2**31, size=N, dtype=np.uint32)
    lane = rng.integers(0, W, size=N)
    hit = rng.random(N) < 0.5
    t = table.copy()
    t[b[hit], lane[hit]] = rem[hit]
    return jnp.array(t), jnp.array(b), jnp.array(rem)


def xla_lookup(table, b, rem):
    rows = table[b]                          # [N, LANES]
    hitlane = rows[:, :W] == rem[:, None]
    return jnp.sum(jnp.where(hitlane, rows[:, W:], jnp.uint32(0)),
                   axis=-1)


def _take_kernel(b_ref, rem_ref, tab_ref, out_ref):
    idx = b_ref[:]                           # [QT]
    rows = jnp.take(tab_ref[:], idx, axis=0)         # [QT, LANES]
    hitlane = rows[:, :W] == rem_ref[:][:, None]
    out_ref[:] = jnp.sum(jnp.where(hitlane, rows[:, W:], jnp.uint32(0)),
                         axis=-1)


def take_lookup(table, b, rem):
    grid = N // QT
    return pl.pallas_call(
        _take_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((QT,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((QT,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),   # resident table
        ],
        out_specs=pl.BlockSpec((QT,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N,), jnp.uint32),
    )(b, rem, table)


def _oneh_kernel(b_ref, rem_ref, tab_ref, out_ref):
    # [QT_MXU, NB] one-hot x [NB, LANES] on the MXU (bf16 exact for
    # 0/1 x uint-as-float? NO — use f32 accumulate of bit-split halves).
    idx = b_ref[:]
    oh = (idx[:, None] ==
          jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], NB), 1)
          ).astype(jnp.float32)
    lo = (tab_ref[:] & jnp.uint32(0xFFFF)).astype(jnp.float32)
    hi = (tab_ref[:] >> jnp.uint32(16)).astype(jnp.float32)
    rlo = jnp.dot(oh, lo, preferred_element_type=jnp.float32)
    rhi = jnp.dot(oh, hi, preferred_element_type=jnp.float32)
    rows = (rhi.astype(jnp.uint32) << jnp.uint32(16)) | \
        rlo.astype(jnp.uint32)
    hitlane = rows[:, :W] == rem_ref[:][:, None]
    out_ref[:] = jnp.sum(jnp.where(hitlane, rows[:, W:], jnp.uint32(0)),
                         axis=-1)


def oneh_lookup(table, b, rem, qt=512):
    grid = N // qt
    return pl.pallas_call(
        _oneh_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((qt,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((qt,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((qt,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N,), jnp.uint32),
    )(b, rem, table)


def measure(fn, table, b, rem, name, want=None):
    try:
        f = jax.jit(fn)
        t0 = time.time()
        out = f(table, b, rem)
        fetch_sync(out)
        compile_sec = time.time() - t0
        got = np.asarray(out)
        if want is not None:
            np.testing.assert_array_equal(got, want)

        def make_loop(n):
            def run(state):
                table, b, rem = state

                def body(_, brs):
                    b, rem = brs
                    out = f(table, b, rem)
                    shift = jax.lax.bitcast_convert_type(
                        out[0], jnp.int32) % jnp.int32(7) + jnp.int32(1)
                    return (jnp.roll(b, shift), jnp.roll(rem, shift))
                return jax.lax.fori_loop(0, n, body, (b, rem))
            return run
        step, _ = marginal_time(make_loop, (table, b, rem), r=8, reps=3)
        emit(variant=name, step_ms=round(step * 1e3, 3),
             rows_per_sec=round(N / step / 1e6, 1),
             compile_sec=round(compile_sec, 1))
        return got
    except Exception as e:  # noqa: BLE001 — survey which variants lower
        emit(variant=name, error=repr(e)[:300])
        return None


def main():
    table, b, rem = make_world()
    want = measure(xla_lookup, table, b, rem, "xla")
    measure(take_lookup, table, b, rem, "take", want)
    measure(functools.partial(oneh_lookup), table, b, rem, "oneh", want)


if __name__ == "__main__":
    main()
