"""Honest device timing under remote-PJRT tunnels (SURVEY.md C23).

Two hazards make naive timing lie on this environment's TPU attachment
(`axon` PJRT plugin, device behind a network tunnel):

1. ``block_until_ready()`` returns without waiting for device completion —
   "measured" rates come out 20-50x above hardware peak (verified
   2026-08-18: 3700 TFLOP/s on a 197 TFLOP/s chip). The ONLY reliable sync
   is fetching result bytes to the host.
2. Every fetch pays a fixed ~30 ms tunnel round trip, swamping millisecond
   kernels.

The honest protocol, implemented here:

- run R work rounds INSIDE one executable (``jax.lax.fori_loop``), with each
  round's input data-dependent on the previous round's output so nothing can
  be elided, reordered, or overlapped away;
- fetch one element once, after the loop;
- measure at R and 2R rounds and report the MARGINAL time
  ``(t(2R) - t(R)) / R``, cancelling the fixed dispatch+fetch overhead.

This models production steady state, where many batches are enqueued
asynchronously and the per-dispatch overhead overlaps device work.
"""
from __future__ import annotations

import time

import jax
import numpy as np


def fetch_sync(out) -> None:
    """Force REAL completion of `out` by fetching one element to host.

    (`block_until_ready` is a no-op under the axon tunnel — see module
    docstring.)"""
    for leaf in jax.tree.leaves(out):
        np.asarray(jax.numpy.ravel(leaf)[:1])
        break


def _run_once(fn, state) -> float:
    t0 = time.perf_counter()
    fetch_sync(fn(state))
    return time.perf_counter() - t0


def _best_of(fn, state, reps: int) -> float:
    return min(_run_once(fn, state) for _ in range(reps))


def marginal_time(make_loop, state, r: int = 8, reps: int = 3):
    """Marginal per-round time of a chained in-executable loop.

    make_loop(n) must return a jittable ``fn(state) -> state`` running n
    chained rounds internally (round i+1's input derived from round i's
    output). Returns (seconds_per_round, fixed_overhead_seconds).
    """
    fn_r = jax.jit(make_loop(r))
    fn_2r = jax.jit(make_loop(2 * r))
    fetch_sync(fn_r(state))    # compile + warm
    fetch_sync(fn_2r(state))
    t_r = _best_of(fn_r, state, reps)
    t_2r = _best_of(fn_2r, state, reps)
    per_round = max((t_2r - t_r) / r, 1e-9)
    return per_round, max(t_r - r * per_round, 0.0)


def chain_loop(step, perturb, n: int):
    """Build ``fn(state) -> state`` running `step` n times, feeding each
    round's output back through `perturb(state, out) -> state` so rounds
    serialize. Both must be jit-traceable."""
    def fn(state):
        def body(_, st):
            return perturb(st, step(st))
        return jax.lax.fori_loop(0, n, body, state)
    return fn
