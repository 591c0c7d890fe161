"""Microbenchmark: dense-mode (w=1) phase breakdown + pscore variants on
the real TPU chip, honest marginal timing (utils.timing).

VERDICT r1 attributed the 20x dense-vs-headline gap to the O(P^2) scorer;
this measures where the time actually goes at the dense shape
(B=16384 paired 150 bp, k=21 -> P=260 probes/read, ~100 MB table) and
compares pscore implementations:

  quad   [B,P,P] interval-containment matrix (VPU compares)
  rank   2x lax.sort + 2x vmapped searchsorted(method='sort')
  events one combined [B,2P] event sort + prefix sums + tie-fix + unsort

Run: PYTHONPATH=src python experiments/mb_score.py
"""
import os
import sys

sys.path.insert(0, "src")

import jax
import jax.numpy as jnp
import numpy as np

from pangea_tpu.bench import make_bench_world
from pangea_tpu.classify.engine import DeviceIndex, make_classify_fn, pad_batch
from pangea_tpu.kernels import extract_kmers_jnp, lookup_jnp
from pangea_tpu.kernels import score as score_mod
from pangea_tpu.utils.timing import marginal_time

BATCH = 16384
L = 150
K = 21

tax, genomes, idx_dense, rs = make_bench_world()
di = DeviceIndex.from_index(idx_dense, confidence_threshold=0.0)
cfg = di.cfg
b1 = jax.device_put(pad_batch(rs.seqs[:BATCH], BATCH, L))
b2 = jax.device_put(pad_batch(rs.mates[:BATCH], BATCH, L))
tables = di.tables
P = 2 * (L - K + 1)
NPROBE = BATCH * P
print(f"dense shape: B={BATCH} P={P} probes/step={NPROBE}; "
      f"fused table {tables['fused'].shape} "
      f"({tables['fused'].size * 4 / 1e6:.0f} MB); device",
      jax.devices()[0])


def timeit(name, step, state, n_rows=None, r=4):
    def make_loop(n):
        def run(st):
            return jax.lax.fori_loop(0, n, lambda _, s: step(s), st)
        return run
    per, _ = marginal_time(make_loop, state, r=r)
    extra = f"  {n_rows / per / 1e6:7.1f}M rows/s" if n_rows else ""
    print(f"{name:34s} {per * 1e3:9.3f} ms  "
          f"{BATCH / per / 1e3:8.1f}k reads/s{extra}")
    return per


def extract_pair(x, y):
    h1, l1, v1 = extract_kmers_jnp(x, K)
    h2, l2, v2 = extract_kmers_jnp(y, K)
    return (jnp.concatenate([h1, h2], 1), jnp.concatenate([l1, l2], 1),
            jnp.concatenate([v1, v2], 1))


def s_extract(st):
    x, y = st
    hi, lo, _ = extract_pair(x, y)
    s = (hi[0, 0] % jnp.uint32(7)).astype(jnp.int32) + 1
    return (jnp.roll(x, s, 0), jnp.roll(y, s, 0))


def s_lookup(st):
    x, y = st
    hi, lo, valid = extract_pair(x, y)
    t, ti, to = lookup_jnp(hi, lo, valid, tables["fused"][0],
                           tables["stash"][0], ways=cfg.ways)
    s = t[0, 0] % jnp.int32(7) + 1
    return (jnp.roll(x, s, 0), jnp.roll(y, s, 0))


t_e = timeit("extract only", s_extract, (b1, b2))
t_l = timeit("extract+lookup (100MB table)", s_lookup, (b1, b2), NPROBE)

for impl in ("quad", "rank"):
    os.environ["PANGEA_PSCORE"] = impl
    fn = make_classify_fn(cfg, paired=True)

    def s_full(st, fn=fn):
        x, y = st
        out = fn(tables, x, y)
        s = out["best"][0] % jnp.int32(7) + 1
        return (jnp.roll(x, s, 0), jnp.roll(y, s, 0))

    timeit(f"FULL step pscore={impl}", s_full, (b1, b2), NPROBE)
os.environ["PANGEA_PSCORE"] = "auto"

# --- scorer-only on synthetic hit tensors --------------------------------
rng = np.random.default_rng(0)
T = tax.num_taxa
taxa0 = rng.integers(0, T + 1, size=(BATCH, P)).astype(np.int32)
taxa0 = np.where(rng.random((BATCH, P)) < 0.5, taxa0, 0)  # ~50% hit rate
tin0 = tax.tin[taxa0].astype(np.int32)
tout0 = tax.tout[taxa0].astype(np.int32)
tax_arrays = {k2: jax.device_put(v) for k2, v in tax.device_arrays().items()}
st0 = tuple(map(jax.device_put, (jnp.array(taxa0), jnp.array(tin0),
                                 jnp.array(tout0))))


def mk_score(pfn):
    def s(st):
        taxon, t_in, t_out = st
        hit = taxon != 0
        ps = jnp.where(hit, pfn(t_in, t_out, hit), 0)
        best = jnp.max(ps, axis=1)
        sft = best[0] % jnp.int32(7) + 1
        return (jnp.roll(taxon, sft, 0), jnp.roll(t_in, sft, 0),
                jnp.roll(t_out, sft, 0))
    return s


def _pscore_events(t_in, t_out, hit):
    """One combined event sort: events = tins(+1) and touts(-1), sorted by
    (value, type tout<tin); prefix sum gives g at each tin event; tie-fix
    by max-over-equal-value segments; unsort by payload scatter."""
    B, Pn = t_in.shape
    big = jnp.int32(2**31 - 1)
    vin = jnp.where(hit, t_in, big)
    vout = jnp.where(hit, t_out, big)
    vals = jnp.concatenate([vout, vin], axis=1)              # [B, 2P]
    typ = jnp.concatenate([jnp.zeros((B, Pn), jnp.int32),
                           jnp.ones((B, Pn), jnp.int32)], axis=1)
    pay = jnp.broadcast_to(jnp.arange(2 * Pn, dtype=jnp.int32)[None],
                           (B, 2 * Pn))
    sv, stp, sp = jax.lax.sort((vals, typ, pay), dimension=1, num_keys=2)
    delta = jnp.where(stp == 1, jnp.int32(1), jnp.int32(-1))
    g = jnp.cumsum(delta, axis=1)
    # tie-fix: equal (value) runs of tin events share the run-max g.
    # within a run g is increasing (+1 per tin), so run-max = value at the
    # last element of the run; propagate right-to-left via reverse cummax
    # over segments — implement as: mark run ends, then reverse-scan.
    nxt_diff = jnp.concatenate(
        [sv[:, 1:] != sv[:, :-1],
         jnp.ones((B, 1), bool)], axis=1)
    # reverse cumulative "copy from the right until segment boundary":
    gr = jnp.where(nxt_diff, g, jnp.int32(-2**31))
    gr = jax.lax.associative_scan(jnp.maximum, gr[:, ::-1], axis=1)[:, ::-1]
    # unsort: scatter g back to original payload positions, keep tin half.
    out = jnp.zeros((B, 2 * Pn), jnp.int32)
    out = jax.vmap(lambda o, p, v: o.at[p].set(v))(out, sp, gr)
    return out[:, Pn:]


timeit("scorer quad", mk_score(score_mod._pscore_quadratic), st0)
timeit("scorer rank", mk_score(score_mod._pscore_ranked), st0)
timeit("scorer events", mk_score(_pscore_events), st0)

# sanity: events == quad on this data
q = np.asarray(score_mod._pscore_quadratic(*map(jnp.array,
                                                (tin0, tout0,
                                                 taxa0 != 0))))
e = np.asarray(_pscore_events(*map(jnp.array, (tin0, tout0, taxa0 != 0))))
hitm = taxa0 != 0
print("events == quad at hit positions:",
      bool((q[hitm] == e[hitm]).all()))


# --- raw sort cost at the event shape ------------------------------------
def s_sort(st):
    taxon, t_in, t_out = st
    vals = jnp.concatenate([t_in, t_out], axis=1)
    sv = jax.lax.sort(vals, dimension=1)
    sft = sv[0, 0] % jnp.int32(7) + 1
    return (jnp.roll(taxon, sft, 0), jnp.roll(t_in, sft, 0),
            jnp.roll(t_out, sft, 0))


timeit("lax.sort [B,2P] 1key", s_sort, st0)
