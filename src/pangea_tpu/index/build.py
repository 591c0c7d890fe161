"""Offline index builder (SURVEY.md C6).

Scans reference genomes, extracts canonical k-mers (optionally minimizer-
subsampled), LCA-merges duplicates across taxa, and lays the result out as
the dense open-addressing table of SEMANTICS.md §5. Pure host-side numpy —
no device involvement (SURVEY.md §4.2). Deterministic: insertion in ascending
canonical-k-mer order.
"""
from __future__ import annotations

import numpy as np

from ..core import canonical_kmers, hash32_np, minimizer_mask
from ..taxonomy import Taxonomy
from .container import EMPTY_HI, Index, IndexMeta


def _kmers_of_genome(codes: np.ndarray, k: int, w: int) -> np.ndarray:
    """Distinct canonical k-mers (uint64) of one genome sequence."""
    canon, valid = canonical_kmers(codes, k)
    if w > 1:
        sel = minimizer_mask(canon, valid, w)
    else:
        sel = valid
    return np.unique(canon[sel])


def aggregate_kmers(genomes, k: int, w: int, taxonomy: Taxonomy,
                    progress=None):
    """genomes: iterable of (codes: uint8[], taxon: int).

    Returns (kmers: uint64[N] ascending, taxa: int32[N]) where taxa[i] is the
    LCA of all source taxa containing kmers[i] (SEMANTICS.md §5).
    """
    all_k: list[np.ndarray] = []
    all_t: list[np.ndarray] = []
    for n, (codes, taxon) in enumerate(genomes):
        km = _kmers_of_genome(np.asarray(codes, dtype=np.uint8), k, w)
        all_k.append(km)
        all_t.append(np.full(km.shape, int(taxon), dtype=np.int32))
        if progress and (n + 1) % 64 == 0:
            progress(n + 1)
    if not all_k:
        return np.zeros(0, np.uint64), np.zeros(0, np.int32)
    kmers = np.concatenate(all_k)
    taxa = np.concatenate(all_t)
    # Group by k-mer; sort taxa ascending within groups (SEMANTICS.md §5 —
    # LCA-fold order is immaterial but fixed for determinism).
    order = np.lexsort((taxa, kmers))
    kmers = kmers[order]
    taxa = taxa[order]
    # Segment boundaries.
    new = np.concatenate([[True], kmers[1:] != kmers[:-1]])
    starts = np.flatnonzero(new)
    ends = np.concatenate([starts[1:], [kmers.shape[0]]])
    uk = kmers[starts]
    ut = taxa[starts].copy()
    multi = (ends - starts) > 1
    for i in np.flatnonzero(multi):
        ut[i] = taxonomy.lca_many(taxa[starts[i]:ends[i]])
    return uk, ut


WAYS = 8  # bucket width (SEMANTICS.md §5): one 96 B row gather per probe


def layout_table(kmers: np.ndarray, taxa: np.ndarray,
                 load_factor: float = 0.7):
    """Place (kmer → taxon) pairs into the bucketized open-addressing table
    (SEMANTICS.md §5, v2): NB power-of-two buckets × WAYS lanes; home bucket
    ``hash32 & (NB-1)``; deterministic parallel-round bucket fill — in round
    r every unplaced k-mer targets ``(home + r) & (NB-1)``, and within each
    bucket contenders in ascending canonical order claim free lanes in
    ascending lane order. Spill past a bucket happens only once it is
    completely full, which is what makes lookup's early-exit-on-empty-lane
    rule exact.

    Returns (key_hi [NB, WAYS], key_lo [NB, WAYS], val [NB, WAYS],
    n_buckets, max_probe)."""
    kmers = np.asarray(kmers, dtype=np.uint64)
    n = kmers.shape[0]
    if n > 1 and not (kmers[1:] > kmers[:-1]).all():
        order = np.argsort(kmers, kind="stable")
        kmers, taxa = kmers[order], np.asarray(taxa)[order]
    nb = 8
    while nb * WAYS * load_factor < max(n, 1):
        nb *= 2
    key_hi = np.full((nb, WAYS), EMPTY_HI, dtype=np.uint32)
    key_lo = np.zeros((nb, WAYS), dtype=np.uint32)
    val = np.zeros((nb, WAYS), dtype=np.int32)
    fill = np.zeros(nb, dtype=np.int64)
    hi = (kmers >> np.uint64(32)).astype(np.uint32)
    lo = (kmers & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    home = (hash32_np(kmers) & np.uint32(nb - 1)).astype(np.int64)
    pending = np.arange(n)
    max_probe = 1
    r = 0
    while pending.size:
        b = (home[pending] + r) & np.int64(nb - 1)
        # Stable sort by bucket keeps ascending-canonical order within each
        # bucket group (pending is always ascending).
        order = np.argsort(b, kind="stable")
        bs, ps = b[order], pending[order]
        newgrp = np.concatenate([[True], bs[1:] != bs[:-1]])
        grp = np.cumsum(newgrp) - 1
        first = np.flatnonzero(newgrp)
        rank = np.arange(bs.size) - first[grp]
        free = WAYS - fill[bs]
        place = rank < free
        lanes = fill[bs] + rank
        tgt = ps[place]
        key_hi[bs[place], lanes[place]] = hi[tgt]
        key_lo[bs[place], lanes[place]] = lo[tgt]
        val[bs[place], lanes[place]] = taxa[tgt]
        np.add.at(fill, bs[place], 1)
        if place.any():
            max_probe = r + 1
        # Restore ascending index order (= ascending canonical) for the
        # next round's within-bucket ordering rule.
        pending = np.sort(ps[~place])
        r += 1
    return key_hi, key_lo, val, nb, max_probe


def build_index(genomes, taxonomy: Taxonomy, k: int, w: int = 1,
                load_factor: float = 0.7, progress=None) -> Index:
    """Build an :class:`Index` from (codes, taxon) genome pairs."""
    if k % 2 == 0 or not (1 <= k <= 31):
        raise ValueError("k must be odd and 1..31 (SEMANTICS.md §2)")
    uk, ut = aggregate_kmers(genomes, k, w, taxonomy, progress=progress)
    key_hi, key_lo, val, nb, max_probe = layout_table(uk, ut, load_factor)
    from .. import SEMANTICS_VERSION
    meta = IndexMeta(
        k=k, w=w, n_buckets=nb, ways=WAYS, max_probe=max_probe,
        n_kmers=int(uk.shape[0]),
        taxonomy_hash=taxonomy.content_hash(),
        semantics_version=SEMANTICS_VERSION,
    )
    return Index(meta, key_hi, key_lo, val, taxonomy)
