"""Golden CPU model (SURVEY.md C22): a straightforward, pure-numpy
implementation of the frozen classification semantics (docs/SEMANTICS.md
§7–§9). This is the parity oracle — the reference checkout was empty at
build time (SURVEY.md §0), so the driver's "bit-identical to the reference"
target is realized as "bit-identical to this model"; if the real PANGEA-plus
binary appears later, re-point the parity tests at it and diff.

Deliberately simple and scalar-ish — clarity over speed. The fast paths
(jnp engine, Pallas kernels) are tested bit-exact against this.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..core import canonical_kmers, minimizer_mask
from ..index import Index
from ..taxonomy import Taxonomy


@dataclass
class GoldenResult:
    taxon: int      # assigned taxon (0 = unclassified) after threshold
    best: int       # winning path score (hit k-mers on root→assignment path side)
    nvalid: int     # valid k-mer positions (confidence denominator)
    conf: float     # float32 best/nvalid


def _score_hits(taxa_hits: np.ndarray, nvalid: int, taxonomy: Taxonomy,
                confidence_threshold: float) -> GoldenResult:
    """SEMANTICS.md §7 on a flat array of per-position hit taxa (0 = miss)."""
    hits = taxa_hits[taxa_hits != 0]
    if nvalid == 0 or hits.size == 0:
        return GoldenResult(0, 0, int(nvalid), 0.0)
    cand, counts = np.unique(hits, return_counts=True)
    tin, tout = taxonomy.tin, taxonomy.tout
    # pscore(t) = sum over hit taxa a (with multiplicity) of
    # is_ancestor_or_self(a, t)  — SEMANTICS.md §7.1.
    anc = (tin[cand][:, None] <= tin[cand][None, :]) & \
          (tin[cand][None, :] < tout[cand][:, None])
    pscore = (counts[:, None] * anc).sum(axis=0)
    best = int(pscore.max())
    winners = cand[pscore == best]
    assigned = taxonomy.lca_many(winners)
    conf = np.float32(best) / np.float32(nvalid)
    taxon = assigned if not (conf < np.float32(confidence_threshold)) else 0
    return GoldenResult(int(taxon), best, int(nvalid), float(conf))


def _read_hits(codes: np.ndarray, index: Index):
    """One sequence → (per-position hit taxa int32[P], nvalid)."""
    k, w = index.meta.k, index.meta.w
    canon, valid = canonical_kmers(np.asarray(codes, dtype=np.uint8), k)
    nvalid = int(valid.sum())
    if w > 1:
        sel = minimizer_mask(canon, valid, w)
    else:
        sel = valid
    taxa = index.lookup_np(canon, sel)
    return taxa, nvalid


def classify_read_golden(codes, index: Index, confidence_threshold: float,
                         mate_codes=None) -> GoldenResult:
    """Classify one read (or pair — SEMANTICS.md §8) against an index."""
    taxa, nvalid = _read_hits(codes, index)
    if mate_codes is not None:
        taxa2, nvalid2 = _read_hits(mate_codes, index)
        taxa = np.concatenate([taxa, taxa2])
        nvalid += nvalid2
    return _score_hits(taxa, nvalid, index.taxonomy, confidence_threshold)


def classify_reads_golden(reads, index: Index, confidence_threshold: float,
                          mates=None) -> list[GoldenResult]:
    if mates is None:
        return [classify_read_golden(r, index, confidence_threshold)
                for r in reads]
    return [classify_read_golden(r, index, confidence_threshold, mate_codes=m)
            for r, m in zip(reads, mates)]


def merge_multik_golden(r1: GoldenResult, r2: GoldenResult,
                        taxonomy: Taxonomy) -> tuple[int, float]:
    """SEMANTICS.md §9: merge two classifiers' (taxon, conf) per read."""
    t1, t2 = r1.taxon, r2.taxon
    c1 = np.float32(r1.conf)
    c2 = np.float32(r2.conf)
    if t1 == 0 and t2 == 0:
        return 0, 0.0
    if t1 == 0:
        return t2, float(c2)
    if t2 == 0:
        return t1, float(c1)
    if t1 == t2:
        return t1, float(max(c1, c2))
    return taxonomy.lca(t1, t2), float(min(c1, c2))
