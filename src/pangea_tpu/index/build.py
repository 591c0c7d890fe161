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


def layout_table(kmers: np.ndarray, taxa: np.ndarray,
                 load_factor: float = 0.7):
    """Place (kmer → taxon) pairs into the open-addressing arrays.

    Insertion in ascending canonical order with linear probing
    (SEMANTICS.md §5). Returns (key_hi, key_lo, val, size, max_probe)."""
    n = kmers.shape[0]
    size = 64
    while size * load_factor < max(n, 1):
        size *= 2
    mask = np.uint32(size - 1)
    key_hi = np.full(size, EMPTY_HI, dtype=np.uint32)
    key_lo = np.zeros(size, dtype=np.uint32)
    val = np.zeros(size, dtype=np.int32)
    hi = (kmers >> np.uint64(32)).astype(np.uint32)
    lo = (kmers & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    slot = (hash32_np(kmers) & mask).astype(np.int64)
    max_probe = 0
    # Vectorized rounds of linear probing: attempt to claim slots; collisions
    # (slot occupied, or two pending keys hashing to one slot) retry at +1.
    pending = np.arange(n)
    cur = slot.copy()
    probes = 1
    while pending.size:
        s = cur[pending]
        free = key_hi[s] == EMPTY_HI
        cand = pending[free]
        sc = s[free]
        # First claimant per slot wins this round (np.unique keeps first
        # occurrence = lowest kmer index = ascending canonical order).
        uniq_s, first = np.unique(sc, return_index=True)
        winners = cand[first]
        key_hi[cur[winners]] = hi[winners]
        key_lo[cur[winners]] = lo[winners]
        val[cur[winners]] = taxa[winners]
        max_probe = max(max_probe, probes)
        won = np.zeros(n, dtype=bool)
        won[winners] = True
        pending = pending[~won[pending]]
        cur[pending] = (cur[pending] + 1) & np.int64(size - 1)
        probes += 1
    return key_hi, key_lo, val, size, max_probe


def build_index(genomes, taxonomy: Taxonomy, k: int, w: int = 1,
                load_factor: float = 0.7, progress=None) -> Index:
    """Build an :class:`Index` from (codes, taxon) genome pairs."""
    if k % 2 == 0 or not (1 <= k <= 31):
        raise ValueError("k must be odd and 1..31 (SEMANTICS.md §2)")
    uk, ut = aggregate_kmers(genomes, k, w, taxonomy, progress=progress)
    key_hi, key_lo, val, size, max_probe = layout_table(uk, ut, load_factor)
    from .. import SEMANTICS_VERSION
    meta = IndexMeta(
        k=k, w=w, size=size, max_probe=max_probe, n_kmers=int(uk.shape[0]),
        taxonomy_hash=taxonomy.content_hash(),
        semantics_version=SEMANTICS_VERSION,
    )
    return Index(meta, key_hi, key_lo, val, taxonomy)
