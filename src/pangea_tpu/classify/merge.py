"""Multi-classifier (multi-k) merge (SURVEY.md C15), jnp path.

Implements SEMANTICS.md §9 elementwise over the batch, integer-only:
confidence comparisons are exact-rational int32 cross-multiplications, so
every backend agrees bit-for-bit. Bit-exactness contract: identical to
`pangea_tpu.golden.merge_multik_golden`.
"""
from __future__ import annotations

import jax.numpy as jnp

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
