"""Index container & serialization (SURVEY.md C7/C8).

The on-device layout IS the on-disk layout: a bucketized power-of-two
open-addressing table (SEMANTICS.md §5 v2 — NB buckets × 8 ways) as three
dense arrays (``key_hi``/``key_lo`` uint32[NB, 8], ``val`` int32[NB, 8])
that `jax.device_put` can ship to HBM unchanged. A lookup gathers ONE
contiguous bucket row (96 B) per probe round and compares 8 lanes on the
VPU — the TPU-native replacement for a pointer/probe-chain hash table. On
disk an index is a directory::

    meta.json      header: k, w, n_buckets, ways, counts, hashes
    key_hi.npy     uint32[NB, 8]   (np.load mmap-able)
    key_lo.npy     uint32[NB, 8]
    val.npy        int32[NB, 8]
    taxonomy.npz   the taxonomy the index was built against

Empty lanes carry ``key_hi == EMPTY_HI`` (0xFFFFFFFF — unreachable for valid
k-mers with k ≤ 31).
"""
from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass

import numpy as np

from ..taxonomy import Taxonomy

EMPTY_HI = np.uint32(0xFFFFFFFF)
FORMAT_VERSION = 3


@dataclass
class IndexMeta:
    k: int
    w: int                  # minimizer window (1 = every k-mer)
    n_buckets: int          # NB (power of two)
    ways: int               # lanes per bucket (8)
    n_kmers: int            # distinct k-mers stored
    taxonomy_hash: str
    semantics_version: int
    format_version: int = FORMAT_VERSION

    @property
    def size(self) -> int:
        """Total slots (NB × ways)."""
        return self.n_buckets * self.ways


class Index:
    """An immutable k-mer → taxon open-addressing table + its taxonomy."""

    def __init__(self, meta: IndexMeta, key_hi, key_lo, val,
                 taxonomy: Taxonomy):
        self.meta = meta
        self.key_hi = np.asarray(key_hi, dtype=np.uint32)
        self.key_lo = np.asarray(key_lo, dtype=np.uint32)
        self.val = np.asarray(val, dtype=np.int32)
        self.taxonomy = taxonomy

    # ------------------------------------------------------------ lookups
    def lookup_np(self, canon: np.ndarray, valid: np.ndarray) -> np.ndarray:
        """Host-side lookup (golden path). canon uint64 → taxon int32
        (0 = miss). Exactly per SEMANTICS.md §5 v3: gather the two candidate
        buckets, compare all 16 lanes, matching lane yields its val."""
        from .build import bucket_pair_np
        canon = np.asarray(canon, dtype=np.uint64)
        hi = (canon >> np.uint64(32)).astype(np.uint32)
        lo = (canon & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        b1, b2 = bucket_pair_np(canon, self.meta.n_buckets)
        out = np.zeros(canon.shape, dtype=np.int32)
        alive = np.asarray(valid, dtype=bool)
        idx = np.flatnonzero(alive)
        for b in (b1[idx], b2[idx]):
            hitlane = ((self.key_hi[b] == hi[idx, None])
                       & (self.key_lo[b] == lo[idx, None]))
            anyhit = hitlane.any(axis=1)
            lane = np.argmax(hitlane, axis=1)
            out[idx[anyhit]] = self.val[b[anyhit], lane[anyhit]]
        return out

    # -------------------------------------------------------------- serde
    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "meta.json"), "w") as fh:
            json.dump(asdict(self.meta), fh, indent=2, sort_keys=True)
        np.save(os.path.join(path, "key_hi.npy"), self.key_hi)
        np.save(os.path.join(path, "key_lo.npy"), self.key_lo)
        np.save(os.path.join(path, "val.npy"), self.val)
        self.taxonomy.save(os.path.join(path, "taxonomy.npz"))

    @classmethod
    def load(cls, path: str, mmap: bool = True) -> "Index":
        with open(os.path.join(path, "meta.json")) as fh:
            meta = IndexMeta(**json.load(fh))
        mode = "r" if mmap else None
        key_hi = np.load(os.path.join(path, "key_hi.npy"), mmap_mode=mode)
        key_lo = np.load(os.path.join(path, "key_lo.npy"), mmap_mode=mode)
        val = np.load(os.path.join(path, "val.npy"), mmap_mode=mode)
        taxonomy = Taxonomy.load(os.path.join(path, "taxonomy.npz"))
        if meta.taxonomy_hash != taxonomy.content_hash():
            raise ValueError(f"{path}: taxonomy hash mismatch — index was "
                             "built against a different taxonomy")
        return cls(meta, key_hi, key_lo, val, taxonomy)

    # --------------------------------------------------------------- misc
    @property
    def nbytes(self) -> int:
        return self.key_hi.nbytes + self.key_lo.nbytes + self.val.nbytes

    def __repr__(self) -> str:
        m = self.meta
        return (f"Index(k={m.k}, w={m.w}, slots={m.size}, kmers={m.n_kmers}, "
                f"{self.nbytes/1e6:.1f} MB)")
