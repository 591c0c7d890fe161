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

from ..core import (canonical_kmers, disjoint_query_minimizers,
                    minimizer_mask)
from ..index import Index
from ..taxonomy import Taxonomy


@dataclass
class GoldenResult:
    taxon: int      # assigned taxon (0 = unclassified) after threshold
    best: int       # winning path score (hit k-mers on root→assignment path side)
    nvalid: int     # valid k-mer positions (confidence denominator)

    @property
    def conf(self) -> float:
        """Host-derived reported confidence (SEMANTICS.md §7.7)."""
        if self.nvalid == 0:
            return 0.0
        return float(np.float32(self.best) / np.float32(self.nvalid))


def _score_hits(taxa_hits: np.ndarray, nvalid: int, taxonomy: Taxonomy,
                confidence_threshold: float) -> GoldenResult:
    """SEMANTICS.md §7 on a flat array of per-position hit taxa (0 = miss)."""
    hits = taxa_hits[taxa_hits != 0]
    if nvalid == 0 or hits.size == 0:
        return GoldenResult(0, 0, int(nvalid))
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
    # Threshold gate: single IEEE f32 multiply-compare (SEMANTICS.md §7.6).
    below = np.float32(best) < np.float32(confidence_threshold) * np.float32(nvalid)
    taxon = 0 if below else assigned
    return GoldenResult(int(taxon), best, int(nvalid))


def _read_hits(codes: np.ndarray, index: Index):
    """One sequence → (per-probe hit taxa int32, nvalid).

    w = 1: one probe per valid k-mer position; nvalid = valid positions.
    w > 1: one probe per valid disjoint window (SEMANTICS.md §3 v4);
    nvalid = valid windows.
    """
    k, w = index.meta.k, index.meta.w
    canon, valid = canonical_kmers(np.asarray(codes, dtype=np.uint8), k)
    if w <= 1 or canon.shape[0] == 0:
        nvalid = int(valid.sum())
        taxa = index.lookup_np(canon, valid)
        return taxa, nvalid
    pos, wvalid = disjoint_query_minimizers(canon, valid, w)
    nvalid = int(wvalid.sum())
    taxa = index.lookup_np(canon[pos], wvalid)
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
                        taxonomy: Taxonomy) -> GoldenResult:
    """SEMANTICS.md §9: merge two classifiers' (taxon, best, nvalid)
    triples per read. Confidence comparisons are exact-rational integer
    cross-multiplications; ties pick r1."""
    t1, t2 = r1.taxon, r2.taxon
    if t1 == 0 and t2 == 0:
        return GoldenResult(0, 0, r1.nvalid + r2.nvalid)
    if t1 == 0:
        return GoldenResult(t2, r2.best, r2.nvalid)
    if t2 == 0:
        return GoldenResult(t1, r1.best, r1.nvalid)
    x1 = r1.best * r2.nvalid   # conf1 vs conf2 as exact rationals
    x2 = r2.best * r1.nvalid
    if t1 == t2:
        keep = r1 if x1 >= x2 else r2        # higher confidence; tie → r1
        return GoldenResult(t1, keep.best, keep.nvalid)
    keep = r1 if x1 <= x2 else r2            # lower confidence; tie → r1
    return GoldenResult(taxonomy.lca(t1, t2), keep.best, keep.nvalid)
