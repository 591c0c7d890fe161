"""Sharded on-disk index container (SURVEY.md C7/C8; VERDICT r1 #4).

RefSeq-scale indexes (driver configs 3/5) cannot be laid out monolithically
in RAM, and they load straight onto a mesh ``shard`` axis anyway — so the
out-of-core builder writes ONE single-probe table per hash-range shard
(SEMANTICS.md §5.1 owner rule: top log2(S) bits of the k-mer hash), each
laid out by the exact monolithic rule over the shard's own k-mer set. A
sharded index whose shard count matches the mesh's loads by mmap + pad —
no re-layout, no O(index) RAM. On disk::

    meta.json            k, w, ways, n_shards, per-shard bucket/stash counts
    taxonomy.npz
    shard000/key_hi.npy  uint32[NB_s, W]   (np.load mmap-able)
    shard000/key_lo.npy  uint32[NB_s, W]
    shard000/val.npy     int32[NB_s, W]
    shard000/stash.npy   uint32[3, S_s]
    shard001/...

Bit-exactness: for the same k-mer set, ``ShardedIndex.shard_tables(n)``
returns arrays identical to ``shard.shard_tables(monolithic_index, n)`` —
the per-shard key sets are defined by the same owner rule and the layout
rule is deterministic (tested in tests/test_index_ooc.py).
"""
from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field

import numpy as np

from ..taxonomy import Taxonomy
from .container import FORMAT_VERSION, Index, IndexMeta


@dataclass
class ShardedIndexMeta:
    k: int
    w: int
    ways: int
    n_shards: int
    n_kmers: int
    shard_buckets: list    # per-shard NB (powers of two)
    shard_stash: list      # per-shard stash sizes
    taxonomy_hash: str
    semantics_version: int
    format_version: int = FORMAT_VERSION
    sharded: bool = field(default=True)   # discriminates meta.json flavors


def _shard_dir(path: str, s: int) -> str:
    return os.path.join(path, f"shard{s:03d}")


class ShardedIndex:
    """A k-mer → taxon index stored as per-hash-range shard tables."""

    def __init__(self, meta: ShardedIndexMeta, shards: list, taxonomy,
                 path: str | None = None):
        self.meta = meta
        self.shards = shards      # list of (key_hi, key_lo, val, stash)
        self.taxonomy = taxonomy
        self.path = path          # set by load(); lets placement re-mmap
        #                           shards transiently (RAM discipline)

    def open_shard(self, s: int):
        """(key_hi, key_lo, val, stash) of one shard as FRESH mmaps that
        are munmapped when the caller drops them — unlike ``shards[s]``,
        whose mappings live as long as the index. Used by the streaming
        placement path so resident file pages stay bounded by ~one shard
        (VERDICT r2 #5)."""
        if self.path is None:
            return self.shards[s]
        d = _shard_dir(self.path, s)
        return tuple(np.load(os.path.join(d, f"{n}.npy"), mmap_mode="r")
                     for n in ("key_hi", "key_lo", "val", "stash"))

    # ------------------------------------------------------------- serde
    @classmethod
    def load(cls, path: str, mmap: bool = True) -> "ShardedIndex":
        with open(os.path.join(path, "meta.json")) as fh:
            meta = ShardedIndexMeta(**json.load(fh))
        if meta.format_version != FORMAT_VERSION:
            raise ValueError(
                f"{path}: index format v{meta.format_version} != "
                f"v{FORMAT_VERSION} — rebuild the index")
        mode = "r" if mmap else None
        shards = []
        for s in range(meta.n_shards):
            d = _shard_dir(path, s)
            shards.append(tuple(
                np.load(os.path.join(d, f"{name}.npy"), mmap_mode=mode)
                for name in ("key_hi", "key_lo", "val", "stash")))
        taxonomy = Taxonomy.load(os.path.join(path, "taxonomy.npz"))
        if meta.taxonomy_hash != taxonomy.content_hash():
            raise ValueError(f"{path}: taxonomy hash mismatch — index was "
                             "built against a different taxonomy")
        return cls(meta, shards, taxonomy, path=path)

    # ---------------------------------------------------------- device path
    def shard_tables(self, n_shards: int, load_factor: float = 0.5):
        """Stacked device tables at the mesh's shard count (see
        shard.shard_tables). Matching counts mmap straight through; a
        mismatched mesh re-lays only per-shard-sized pieces (split by the
        next hash bits, or merge adjacent shards — the owner rule nests:
        mesh owner bits are a prefix of file owner bits)."""
        from .build import layout_table
        from .shard import extract_pairs_tables, owner_of, stack_parts
        S = self.meta.n_shards
        if n_shards == S:
            parts = [(khi, klo, v, st, khi.shape[0])
                     for (khi, klo, v, st) in self.shards]
            return stack_parts(parts)
        if n_shards < S:          # merge groups of r adjacent file shards
            r = S // n_shards
            parts = []
            for m in range(n_shards):
                cs, ts = [], []
                for s in range(m * r, (m + 1) * r):
                    c, t = extract_pairs_tables(*self.shards[s])
                    cs.append(c)
                    ts.append(t)
                canon = np.concatenate(cs)
                taxa = np.concatenate(ts)
                order = np.argsort(canon, kind="stable")
                parts.append(layout_table(canon[order], taxa[order],
                                          load_factor,
                                          ways=self.meta.ways))
            return stack_parts(parts)
        # n_shards > S: split each file shard by the next hash bits.
        r = n_shards // S
        parts = []
        for s in range(S):
            canon, taxa = extract_pairs_tables(*self.shards[s])
            owner = owner_of(canon, n_shards)
            for m in range(s * r, (s + 1) * r):
                sel = owner == m
                parts.append(layout_table(canon[sel], taxa[sel],
                                          load_factor,
                                          ways=self.meta.ways))
        return stack_parts(parts)

    # ------------------------------------------------------------- lookups
    def lookup_np(self, canon: np.ndarray, valid: np.ndarray) -> np.ndarray:
        """Host-side lookup (golden path; SEMANTICS.md §5/§5.1): route each
        k-mer to its owning shard, probe that shard's table exactly like the
        monolithic Index.lookup_np."""
        from .shard import owner_of
        canon = np.asarray(canon, dtype=np.uint64)
        out = np.zeros(canon.shape, dtype=np.int32)
        alive = np.asarray(valid, dtype=bool)
        owner = owner_of(canon, self.meta.n_shards)
        for s, (khi, klo, v, st) in enumerate(self.shards):
            sel = alive & (owner == s)
            if not sel.any():
                continue
            sub = _as_index(self.meta, khi, klo, v, st, self.taxonomy)
            out[sel] = sub.lookup_np(canon[sel], np.ones(sel.sum(), bool))
        return out

    # --------------------------------------------------------------- misc
    @property
    def nbytes(self) -> int:
        return sum(khi.nbytes + klo.nbytes + v.nbytes + st.nbytes
                   for (khi, klo, v, st) in self.shards)

    def __repr__(self) -> str:
        m = self.meta
        return (f"ShardedIndex(k={m.k}, w={m.w}, shards={m.n_shards}, "
                f"kmers={m.n_kmers}, {self.nbytes/1e9:.2f} GB)")


def _as_index(meta, key_hi, key_lo, val, stash, taxonomy) -> Index:
    """Wrap one shard's arrays as a throwaway monolithic Index (for
    lookup_np reuse). Not saved; meta counts are per-shard."""
    im = IndexMeta(k=meta.k, w=meta.w, n_buckets=key_hi.shape[0],
                   ways=meta.ways, n_kmers=0, n_stash=stash.shape[1],
                   taxonomy_hash=meta.taxonomy_hash,
                   semantics_version=meta.semantics_version)
    idx = Index.__new__(Index)
    idx.meta = im
    idx.key_hi = key_hi
    idx.key_lo = key_lo
    idx.val = val
    idx.stash = stash
    idx.taxonomy = taxonomy
    return idx


def save_shard(path: str, s: int, key_hi, key_lo, val, stash) -> None:
    d = _shard_dir(path, s)
    os.makedirs(d, exist_ok=True)
    np.save(os.path.join(d, "key_hi.npy"), key_hi)
    np.save(os.path.join(d, "key_lo.npy"), key_lo)
    np.save(os.path.join(d, "val.npy"), val)
    np.save(os.path.join(d, "stash.npy"), stash)


def save_meta(path: str, meta: ShardedIndexMeta, taxonomy) -> None:
    taxonomy.save(os.path.join(path, "taxonomy.npz"))
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(asdict(meta), fh, indent=2, sort_keys=True)


def load_index_any(path: str, mmap: bool = True):
    """Load a monolithic or sharded index directory by sniffing meta.json."""
    with open(os.path.join(path, "meta.json")) as fh:
        sharded = json.load(fh).get("sharded", False)
    return (ShardedIndex.load(path, mmap=mmap) if sharded
            else Index.load(path, mmap=mmap))
