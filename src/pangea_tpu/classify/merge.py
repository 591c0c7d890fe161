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


def merge_multik_jnp(res1: dict, res2: dict, tax_arrays: dict) -> dict:
    """res1/res2: dicts of int32 [B] 'taxon', 'best', 'nvalid'."""
    t1, b1, n1 = res1["taxon"], res1["best"], res1["nvalid"]
    t2, b2, n2 = res2["taxon"], res2["best"], res2["nvalid"]
    x1 = b1 * n2
    x2 = b2 * n1
    both0 = (t1 == 0) & (t2 == 0)
    agree = (t1 != 0) & (t1 == t2)
    conflict = (t1 != 0) & (t2 != 0) & (t1 != t2)
    lca = lca_pairs_jnp(t1, t2, tax_arrays["parent"], tax_arrays["depth"],
                        tax_arrays["up"])
    taxon = jnp.where(conflict, lca, jnp.where(t1 != 0, t1, t2))
    # keep1: agree → higher conf (tie r1); conflict → lower conf (tie r1);
    # one-sided → the classified one; both0 → special-cased below.
    keep1 = jnp.where(agree, x1 >= x2,
                      jnp.where(conflict, x1 <= x2, t1 != 0))
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
