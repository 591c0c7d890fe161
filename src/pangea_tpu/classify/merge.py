"""Multi-classifier (multi-k) merge (SURVEY.md C15), jnp path.

Implements SEMANTICS.md §9 elementwise over the batch, integer-only:
confidence comparisons are exact-rational int32 cross-multiplications, so
every backend agrees bit-for-bit. Bit-exactness contract: identical to
`pangea_tpu.golden.merge_multik_golden`.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..kernels.score import lca_pairs_jnp


def _mul_u64(a, b):
    """Exact 64-bit product of two non-negative int32 arrays as two uint32
    limbs (hi, lo) — 16-bit schoolbook. jax runs with x64 disabled, so the
    SEMANTICS.md §9 cross-multiplications cannot widen to int64; this keeps
    them exact for EVERY int32 (best, nvalid), including long-read buckets
    where nvalid exceeds 2^15 and a naive int32 product would wrap."""
    a = a.astype(jnp.uint32)
    b = b.astype(jnp.uint32)
    M = jnp.uint32(0xFFFF)
    a0, a1 = a & M, a >> jnp.uint32(16)
    b0, b1 = b & M, b >> jnp.uint32(16)
    ll = a0 * b0                      # < 2^32, exact in uint32
    mid = a1 * b0 + a0 * b1           # ≤ 2·(2^15)(2^16) < 2^32, exact
    lo = ll + (mid << jnp.uint32(16))
    carry = (lo < ll).astype(jnp.uint32)
    hi = a1 * b1 + (mid >> jnp.uint32(16)) + carry
    return hi, lo


def _ge_u64(h1, l1, h2, l2):
    return (h1 > h2) | ((h1 == h2) & (l1 >= l2))


def merge_multik_jnp(res1: dict, res2: dict, tax_arrays: dict) -> dict:
    """res1/res2: dicts of int32 [B] 'taxon', 'best', 'nvalid'."""
    t1, b1, n1 = res1["taxon"], res1["best"], res1["nvalid"]
    t2, b2, n2 = res2["taxon"], res2["best"], res2["nvalid"]
    # conf1 vs conf2 as exact rationals: b1/n1 ? b2/n2 ⇔ b1·n2 ? b2·n1,
    # computed as exact 64-bit limb products (no overflow for any int32).
    h1, l1 = _mul_u64(b1, n2)
    h2, l2 = _mul_u64(b2, n1)
    x1_ge_x2 = _ge_u64(h1, l1, h2, l2)
    x1_le_x2 = _ge_u64(h2, l2, h1, l1)
    both0 = (t1 == 0) & (t2 == 0)
    agree = (t1 != 0) & (t1 == t2)
    conflict = (t1 != 0) & (t2 != 0) & (t1 != t2)
    lca = lca_pairs_jnp(t1, t2, tax_arrays["parent"], tax_arrays["depth"],
                        tax_arrays["up"])
    taxon = jnp.where(conflict, lca, jnp.where(t1 != 0, t1, t2))
    # keep1: agree → higher conf (tie r1); conflict → lower conf (tie r1);
    # one-sided → the classified one; both0 → special-cased below.
    keep1 = jnp.where(agree, x1_ge_x2,
                      jnp.where(conflict, x1_le_x2, t1 != 0))
    best = jnp.where(both0, jnp.int32(0), jnp.where(keep1, b1, b2))
    nvalid = jnp.where(both0, n1 + n2, jnp.where(keep1, n1, n2))
    return {"taxon": taxon, "best": best, "nvalid": nvalid}


def merge_multik_np(res1: dict, res2: dict, taxonomy) -> dict:
    """Host (numpy) twin of merge_multik_jnp for the pipeline's drain path —
    same SEMANTICS.md §9 rules, vectorized over the batch."""
    t1, b1, n1 = (np.asarray(res1[k]) for k in ("taxon", "best", "nvalid"))
    t2, b2, n2 = (np.asarray(res2[k]) for k in ("taxon", "best", "nvalid"))
    x1 = b1.astype(np.int64) * n2
    x2 = b2.astype(np.int64) * n1
    both0 = (t1 == 0) & (t2 == 0)
    agree = (t1 != 0) & (t1 == t2)
    conflict = (t1 != 0) & (t2 != 0) & (t1 != t2)
    taxon = np.where(t1 != 0, t1, t2).astype(np.int32)
    ci = np.flatnonzero(conflict)
    for i in ci:
        taxon[i] = taxonomy.lca(int(t1[i]), int(t2[i]))
    keep1 = np.where(agree, x1 >= x2, np.where(conflict, x1 <= x2, t1 != 0))
    best = np.where(both0, 0, np.where(keep1, b1, b2)).astype(np.int32)
    nvalid = np.where(both0, n1 + n2,
                      np.where(keep1, n1, n2)).astype(np.int32)
    return {"taxon": taxon, "best": best, "nvalid": nvalid}
