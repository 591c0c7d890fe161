"""Round-2e: does a gather whose operand is a SLICE of a stacked
[n_sub, NB, D] buffer still get the fast-regime rate?

Context (mb_gather3/4): random row gathers run ~290-320M rows/s while the
operand stays <=2^16 rows AND <=~34 MB, ~88M rows/s beyond. The sub-table
split (ClassifyConfig.n_sub) relies on each 33.5 MB half hitting the fast
rate. First implementation stacked both halves in ONE [2, NB, D] device
buffer and gathered from `stacked[t]` — bench showed the dense config at
88M-rows/s prices (83.5 ms/step), i.e. the slice defeated the split.
This microbench isolates that: same table bytes, same queries,
(a) operand = standalone [NB, D] array per sub-table,
(b) operand = stacked[t] slice of one [2, NB, D] array.

Run: PYTHONPATH=src:/root/.axon_site python -u experiments/mb_gather6.py
"""
import sys

sys.path.insert(0, "src")

import jax
import jax.numpy as jnp
import numpy as np

from pangea_tpu.utils.timing import marginal_time

D = 128                       # 512 B rows (W=32 fused)
NB = 1 << 16                  # 2^16 rows -> 33.5 MB: the fast regime
NQ = 1 << 19
rng = np.random.default_rng(0)
halves_np = [rng.integers(0, 2**32, size=(NB, D), dtype=np.uint32)
             for _ in range(2)]
idx_np = rng.integers(0, NB, size=NQ).astype(np.int32)
print("device:", jax.devices()[0],
      f" 2 x {NB}x{D} ({NB*D*4>>20} MB each), NQ={NQ}", flush=True)

sep_d = [jax.device_put(h) for h in halves_np]
stk_d = jax.device_put(np.stack(halves_np))
idx_d = jax.device_put(idx_np)


def run_case(name, gather2):
    def make_loop(r):
        def run(idx):
            def body(_, ix):
                s = gather2(ix)
                return (ix + s[0, 0].astype(jnp.int32)) & jnp.int32(NB - 1)
            return jax.lax.fori_loop(0, r, body, idx)
        return run
    step, _ = marginal_time(make_loop, idx_d, r=4)
    rate = 2 * NQ / step
    print(f"{name:28s} {step*1e3:8.2f} ms/call  {rate/1e6:7.1f}M rows/s",
          flush=True)


run_case("separate buffers", lambda ix: sep_d[0][ix] + sep_d[1][ix])
run_case("stacked[t] slices", lambda ix: stk_d[0][ix] + stk_d[1][ix])
