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


WAYS = 8  # bucket width (SEMANTICS.md §5): one 96 B row gather per choice

_CUCKOO_SALT = np.uint32(0xB2D05E13)  # SEMANTICS.md §4: b2 derivation
_BFS_DEPTH = 64


def bucket_pair_np(kmers: np.ndarray, nb: int):
    """(b1, b2) candidate buckets per SEMANTICS.md §4."""
    from ..core import mix32_np
    h = hash32_np(kmers)
    mask = np.uint32(nb - 1)
    b1 = (h & mask).astype(np.int64)
    b2 = (mix32_np(h ^ _CUCKOO_SALT) & mask).astype(np.int64)
    return b1, b2


def _greedy_pass(target, pending, fill, place_cb):
    """One SEMANTICS.md §5 greedy pass: pending (ascending) target buckets
    `target[pending]`; ascending contenders claim free lanes ascending.
    Returns the still-unplaced subset of pending (ascending)."""
    b = target[pending]
    order = np.argsort(b, kind="stable")
    bs, ps = b[order], pending[order]
    newgrp = np.concatenate([[True], bs[1:] != bs[:-1]])
    grp = np.cumsum(newgrp) - 1
    first = np.flatnonzero(newgrp)
    rank = np.arange(bs.size) - first[grp]
    free = WAYS - fill[bs]
    place = rank < free
    lanes = fill[bs] + rank
    place_cb(ps[place], bs[place], lanes[place])
    np.add.at(fill, bs[place], 1)
    return np.sort(ps[~place])


def layout_table(kmers: np.ndarray, taxa: np.ndarray,
                 load_factor: float = 0.7):
    """Place (kmer → taxon) pairs into the 2-choice bucketized table
    (SEMANTICS.md §5 v3): two greedy passes (b1 then b2) + deterministic BFS
    cuckoo eviction for the rare leftovers; NB doubles and the layout
    restarts if a chain cannot be found.

    Returns (key_hi [NB, WAYS], key_lo [NB, WAYS], val [NB, WAYS],
    n_buckets)."""
    kmers = np.asarray(kmers, dtype=np.uint64)
    taxa = np.asarray(taxa, dtype=np.int32)
    n = kmers.shape[0]
    if n > 1 and not (kmers[1:] > kmers[:-1]).all():
        order = np.argsort(kmers, kind="stable")
        kmers, taxa = kmers[order], taxa[order]
    hi = (kmers >> np.uint64(32)).astype(np.uint32)
    lo = (kmers & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    nb = 8
    while nb * WAYS * load_factor < max(n, 1):
        nb *= 2
    while True:
        out = _try_layout(kmers, hi, lo, taxa, nb)
        if out is not None:
            key_hi, key_lo, val = out
            return key_hi, key_lo, val, nb
        nb *= 2  # SEMANTICS.md §5 step 4


def _try_layout(kmers, hi, lo, taxa, nb):
    n = kmers.shape[0]
    key_hi = np.full((nb, WAYS), EMPTY_HI, dtype=np.uint32)
    key_lo = np.zeros((nb, WAYS), dtype=np.uint32)
    val = np.zeros((nb, WAYS), dtype=np.int32)
    # which k-mer index occupies [bucket, lane] (-1 = empty), and its
    # alternate bucket — host-only bookkeeping for eviction.
    occ = np.full((nb, WAYS), -1, dtype=np.int64)
    fill = np.zeros(nb, dtype=np.int64)
    b1, b2 = bucket_pair_np(kmers, nb)

    def place(ks, bs, lanes):
        key_hi[bs, lanes] = hi[ks]
        key_lo[bs, lanes] = lo[ks]
        val[bs, lanes] = taxa[ks]
        occ[bs, lanes] = ks

    pending = np.arange(n)
    pending = _greedy_pass(b1, pending, fill, place)      # pass 1
    if pending.size:
        pending = _greedy_pass(b2, pending, fill, place)  # pass 2
    for x in pending:                                      # eviction (rare)
        if not _evict_place(int(x), b1, b2, key_hi, key_lo, val, occ, fill,
                            hi, lo, taxa, nb):
            return None
    return key_hi, key_lo, val


def _evict_place(x, b1, b2, key_hi, key_lo, val, occ, fill, hi, lo, taxa,
                 nb) -> bool:
    """Deterministic BFS cuckoo relocation (SEMANTICS.md §5 step 3)."""
    from collections import deque
    start = [int(b1[x]), int(b2[x])]
    # parent[b] = (prev_bucket, lane_in_prev) — resident prev[lane] moves
    # INTO prev's chain successor b.
    parent: dict[int, tuple[int, int]] = {}
    seen = set(start)
    q = deque((b, 0) for b in dict.fromkeys(start))
    found = -1
    while q:
        b, d = q.popleft()
        if fill[b] < WAYS:
            found = b
            break
        if d >= _BFS_DEPTH:
            continue
        for lane in range(WAYS):
            k = int(occ[b, lane])
            a = int(b1[k]) if int(b2[k]) == b else int(b2[k])
            if a not in seen:
                seen.add(a)
                parent[a] = (b, lane)
                q.append((a, d + 1))
    if found < 0:
        return False
    # Unwind: move residents along the chain, freeing a lane in start.
    b = found
    while b in parent:
        pb, lane = parent[b]
        k = int(occ[pb, lane])
        dst_lane = int(fill[b])
        key_hi[b, dst_lane] = hi[k]
        key_lo[b, dst_lane] = lo[k]
        val[b, dst_lane] = taxa[k]
        occ[b, dst_lane] = k
        fill[b] += 1
        # pb[lane] now free; the next (earlier) move fills it, or x does.
        fill[pb] -= 1
        occ[pb, lane] = -1
        key_hi[pb, lane] = EMPTY_HI
        key_lo[pb, lane] = 0
        val[pb, lane] = 0
        # Compact: keep occupied lanes contiguous left-to-right by moving
        # the last occupied lane into the hole (lookup is lane-agnostic).
        last = int(fill[pb])
        if last != lane and occ[pb, last] >= 0:
            key_hi[pb, lane] = key_hi[pb, last]
            key_lo[pb, lane] = key_lo[pb, last]
            val[pb, lane] = val[pb, last]
            occ[pb, lane] = occ[pb, last]
            key_hi[pb, last] = EMPTY_HI
            key_lo[pb, last] = 0
            val[pb, last] = 0
            occ[pb, last] = -1
        b = pb
    dst_lane = int(fill[b])
    key_hi[b, dst_lane] = hi[x]
    key_lo[b, dst_lane] = lo[x]
    val[b, dst_lane] = taxa[x]
    occ[b, dst_lane] = x
    fill[b] += 1
    return True


def build_index(genomes, taxonomy: Taxonomy, k: int, w: int = 1,
                load_factor: float = 0.7, progress=None) -> Index:
    """Build an :class:`Index` from (codes, taxon) genome pairs."""
    if k % 2 == 0 or not (1 <= k <= 31):
        raise ValueError("k must be odd and 1..31 (SEMANTICS.md §2)")
    uk, ut = aggregate_kmers(genomes, k, w, taxonomy, progress=progress)
    key_hi, key_lo, val, nb = layout_table(uk, ut, load_factor)
    from .. import SEMANTICS_VERSION
    meta = IndexMeta(
        k=k, w=w, n_buckets=nb, ways=WAYS,
        n_kmers=int(uk.shape[0]),
        taxonomy_hash=taxonomy.content_hash(),
        semantics_version=SEMANTICS_VERSION,
    )
    return Index(meta, key_hi, key_lo, val, taxonomy)
