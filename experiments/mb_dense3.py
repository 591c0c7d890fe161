"""Dense lookup decomposition (round 3): the q8 lookup phase runs at
~193M rows/s all-in (22.1 ms / 4.26M probes) while the mb_dense_insitu
"raw gather" points claimed 540M+ — those consumed only 2 elements of the
gathered rows, so XLA could shrink the gather (DCE hazard). This
experiment re-measures with FULL consumption (sum of every gathered
byte), isolates compare-vs-stream cost, and tries the narrower q8 W=16
row ([2^17 x 128 B]).

Run: PYTHONPATH=src:/root/.axon_site python experiments/mb_dense3.py
"""
import json
import os

from pangea_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from pangea_tpu.bench import make_bench_world
from pangea_tpu.classify.engine import DeviceIndex, make_classify_fn, pad_batch
from pangea_tpu.index import build_index
from pangea_tpu.utils.timing import marginal_time

BATCH = 16384
L = 150

tax, genomes, idx_dense, rs = make_bench_world()
b1 = jax.device_put(pad_batch(rs.seqs[:BATCH], BATCH, L))
b2 = jax.device_put(pad_batch(rs.mates[:BATCH], BATCH, L))
K = idx_dense.meta.k
P = 2 * (L - K + 1)
NPROBE = BATCH * P
out = {"raw_full": [], "layouts": [], "variants": []}


def timeit(label, make_loop, state, bucket):
    per, _ = marginal_time(make_loop, state, r=4)
    print(f"{label:34s} {per*1e3:8.2f} ms  {NPROBE/per/1e6:7.1f}M rows/s",
          flush=True)
    out[bucket].append({"label": label, "ms": round(per * 1e3, 2),
                        "mrows_per_sec": round(NPROBE / per / 1e6, 1)})
    return per


def raw_full(nrows, rowbytes):
    """Gather NPROBE rows and consume EVERY gathered element (sum)."""
    tab = jax.device_put(np.random.default_rng(0).integers(
        0, 1000, size=(nrows, rowbytes // 4), dtype=np.uint32))
    ridx = jax.device_put(np.random.default_rng(1).integers(
        0, nrows, size=NPROBE).astype(np.int32))

    def make_loop(n):
        def run(state):
            def body(_, s):
                rows = tab[(ridx + s) % jnp.int32(nrows)]
                return (jnp.sum(rows, dtype=jnp.uint32)
                        % jnp.uint32(7)).astype(jnp.int32) + s
            return jax.lax.fori_loop(0, n, body, state)
        return run

    timeit(f"full-consume [{nrows} x {rowbytes}B]", make_loop,
           jnp.int32(0), "raw_full")


def variant(label, nrows, rowbytes, mode):
    """Gather + q8-like lane work: 'cmp' = compare half the row against a
    per-query rem and any-reduce; 'cmp+sel' = compare + payload select-sum
    (the real lookup_q8 shape)."""
    W = rowbytes // 8
    tab = jax.device_put(np.random.default_rng(0).integers(
        0, 2**32, size=(nrows, 2 * W), dtype=np.uint32))
    ridx = jax.device_put(np.random.default_rng(1).integers(
        0, nrows, size=NPROBE).astype(np.int32))
    rem = jax.device_put(np.random.default_rng(2).integers(
        0, 2**26, size=NPROBE, dtype=np.uint32))

    def make_loop(n):
        def run(state):
            def body(_, s):
                rows = tab[(ridx + s) % jnp.int32(nrows)]
                hitlane = rows[:, :W] == rem[:, None]
                if mode == "cmp":
                    acc = jnp.sum(jnp.any(hitlane, -1).astype(jnp.int32))
                else:
                    pk = jnp.sum(jnp.where(hitlane, rows[:, W:],
                                           jnp.uint32(0)), axis=-1)
                    acc = jnp.sum(pk, dtype=jnp.uint32).astype(jnp.int32)
                return acc % jnp.int32(7) + s
            return jax.lax.fori_loop(0, n, body, state)
        return run

    timeit(f"{label} [{nrows} x {rowbytes}B] {mode}", make_loop,
           jnp.int32(0), "variants")


def layout_q8(ways):
    os.environ["PANGEA_Q8_WAYS"] = str(ways)
    idx = build_index(genomes, tax, k=K, w=1, ways=16)
    di = DeviceIndex.from_index(idx, confidence_threshold=0.0, layout="q8")
    fn = make_classify_fn(di.cfg, paired=True)
    tables = di.tables

    def make_loop(n):
        def run(state):
            def body(_, st):
                x, y = st
                o = fn(tables, x, y)
                s = o["best"][0] % jnp.int32(7) + jnp.int32(1)
                return (jnp.roll(x, s, 0), jnp.roll(y, s, 0))
            return jax.lax.fori_loop(0, n, body, state)
        return run

    per, _ = marginal_time(make_loop, (b1, b2), r=4)
    print(f"q8 W={ways} full step: {per*1e3:8.2f} ms "
          f"{BATCH/per:10.0f} reads/s  fused {di.fused.shape}", flush=True)
    out["layouts"].append({"ways": ways, "step_ms": round(per * 1e3, 2),
                           "reads_per_sec": round(BATCH / per, 0)})
    os.environ.pop("PANGEA_Q8_WAYS", None)


if __name__ == "__main__":
    print(f"B={BATCH} P={P} -> {NPROBE/1e6:.2f}M probes", flush=True)
    for nrows, rb in ((65536, 512), (131072, 256), (262144, 256),
                      (131072, 128), (65536, 256)):
        raw_full(nrows, rb)
    variant("q8geom", 65536, 512, "cmp")
    variant("q8geom", 65536, 512, "cmp+sel")
    variant("q8geom", 131072, 128, "cmp+sel")
    layout_q8(16)
    with open("/tmp/mb_dense3.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))
