"""Headline (w=8 paired) breakdown + q8-ways variants (round 3).

Where do the 2.4-2.7 ms go at B=16384 paired w=8 (524k probes/step), and
does a narrower q8 row (W=32: [2^15 x 256 B]) beat the auto W=64
([2^14 x 512 B])?

Run: PYTHONPATH=src:/root/.axon_site python experiments/mb_headline.py
"""
import json
import os

from pangea_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from pangea_tpu.bench import make_bench_world
from pangea_tpu.classify.engine import DeviceIndex, make_classify_fn, pad_batch
from pangea_tpu.index import build_index
from pangea_tpu.kernels import (extract_kmers_jnp, lookup_q8_jnp,
                                select_minimizers_jnp)
from pangea_tpu.utils.timing import marginal_time

BATCH = 16384
L = 150
W = 8

tax, genomes, idx_dense, rs = make_bench_world()
idx = build_index(genomes, tax, k=21, w=W)
b1 = jax.device_put(pad_batch(rs.seqs[:BATCH], BATCH, L))
b2 = jax.device_put(pad_batch(rs.mates[:BATCH], BATCH, L))
out = {"steps": [], "phases": {}}


def step_of(di):
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

    per, _ = marginal_time(make_loop, (b1, b2), r=8)
    return per


for label, env in (("q8 W=64 (auto)", None), ("q8 W=32", "32"),
                   ("q8 W=16", "16")):
    if env:
        os.environ["PANGEA_Q8_WAYS"] = env
    else:
        os.environ.pop("PANGEA_Q8_WAYS", None)
    di = DeviceIndex.from_index(idx, confidence_threshold=0.0, layout="q8")
    per = step_of(di)
    print(f"{label:16s} {per*1e3:7.3f} ms  {BATCH/per/1e6:5.2f}M reads/s  "
          f"fused {di.fused.shape}", flush=True)
    out["steps"].append({"label": label, "step_ms": round(per * 1e3, 3),
                         "mreads_per_sec": round(BATCH / per / 1e6, 3)})
os.environ.pop("PANGEA_Q8_WAYS", None)
di = DeviceIndex.from_index(idx, confidence_threshold=0.0, layout="std")
per = step_of(di)
print(f"{'std W=16':16s} {per*1e3:7.3f} ms  {BATCH/per/1e6:5.2f}M reads/s",
      flush=True)
out["steps"].append({"label": "std W=16", "step_ms": round(per * 1e3, 3),
                     "mreads_per_sec": round(BATCH / per / 1e6, 3)})

# phases of the auto q8 program
di = DeviceIndex.from_index(idx, confidence_threshold=0.0)
cfg = di.cfg
tables = di.tables


def extract_pair(x, y):
    hs, ls, vs = [], [], []
    for bb in (x, y):
        hi, lo, valid = extract_kmers_jnp(bb, cfg.k)
        hi, lo, valid = select_minimizers_jnp(hi, lo, valid, cfg.w)
        hs.append(hi)
        ls.append(lo)
        vs.append(valid)
    return (jnp.concatenate(hs, 1), jnp.concatenate(ls, 1),
            jnp.concatenate(vs, 1))


def t(name, step):
    def make_loop(n):
        def run(state):
            def body(_, st):
                return step(st)
            return jax.lax.fori_loop(0, n, body, state)
        return run
    per, _ = marginal_time(make_loop, (b1, b2), r=8)
    print(f"  {name:22s} {per*1e3:7.3f} ms", flush=True)
    out["phases"][name] = round(per * 1e3, 3)


def s_extract(st):
    x, y = st
    hi, lo, valid = extract_pair(x, y)
    s = (hi[0, 0] % jnp.uint32(7)).astype(jnp.int32) + 1
    return (jnp.roll(x, s, 0), jnp.roll(y, s, 0))


def s_lookup(st):
    x, y = st
    hi, lo, valid = extract_pair(x, y)
    h, ti, to = lookup_q8_jnp(hi, lo, valid, tables["fused"][0],
                              tables["stash"][0], k=cfg.k, ways=cfg.ways)
    s = (h[0, 0] + ti[0, 1]) % jnp.int32(7) + 1
    return (jnp.roll(x, s, 0), jnp.roll(y, s, 0))


fn_full = make_classify_fn(cfg, paired=True)


def s_full(st):
    x, y = st
    o = fn_full(tables, x, y)
    s = o["best"][0] % jnp.int32(7) + 1
    return (jnp.roll(x, s, 0), jnp.roll(y, s, 0))


print("phases (auto q8):", flush=True)
t("extract+minimize", s_extract)
t("extract+min+lookup", s_lookup)
t("full", s_full)
with open("/tmp/mb_headline.json", "w") as fh:
    json.dump(out, fh, indent=2)
print(json.dumps(out))
