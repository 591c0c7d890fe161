"""On-device hash-and-lookup (SURVEY.md C10), jnp path.

The index's 2-choice bucketized table (SEMANTICS.md §5 v3) lives in HBM as
dense uint32/int32 [NB, 8] arrays; a lookup is exactly TWO independent
contiguous bucket-row gathers over the whole [B, P] k-mer batch plus 16
lane-parallel compares on the VPU. No data-dependent probe chains: round
count is a compile-time constant 2, and the two gathers pipeline because
neither depends on the other (measured on TPU v5e: a dependent probe round
costs ~5 ms per 2M k-mers; independent gathers overlap). Ownership check
implements the sharded-index rule of SEMANTICS.md §5.1: a shard probes only
k-mers whose top hash bits name it, everything else reports taxon 0 and is
merged by a later psum.

Bit-exactness contract: identical to `Index.lookup_np` (SEMANTICS.md §4–§5).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_GOLD = jnp.uint32(0x9E3779B9)
_CUCKOO_SALT = jnp.uint32(0xB2D05E13)
_EMPTY_HI = jnp.uint32(0xFFFFFFFF)


def mix32_jnp(v):
    """MurmurHash3 fmix32 finalizer (SEMANTICS.md §4)."""
    v = v ^ (v >> jnp.uint32(16))
    v = v * jnp.uint32(0x85EBCA6B)
    v = v ^ (v >> jnp.uint32(13))
    v = v * jnp.uint32(0xC2B2AE35)
    v = v ^ (v >> jnp.uint32(16))
    return v


def hash32_jnp(hi, lo):
    return mix32_jnp(mix32_jnp(lo ^ _GOLD) ^ hi)


def lookup_jnp(hi, lo, valid, key_hi, key_lo, val, *,
               n_shards: int = 1, shard_id=0):
    """Probe one (possibly sharded) 2-choice table (SEMANTICS.md §5 v3).

    hi/lo/valid: uint32/bool [B, P] from extract_kmers_jnp.
    key_hi/key_lo: uint32 [NB, W]; val: int32 [NB, W] — THIS shard's table.
    Returns taxon int32 [B, P] (0 = miss, not owned, or invalid).
    """
    nb = key_hi.shape[0]
    bmask = jnp.uint32(nb - 1)
    h = hash32_jnp(hi, lo)
    if n_shards > 1:
        log2n = n_shards.bit_length() - 1
        owner = h >> jnp.uint32(32 - log2n)
        mine = valid & (owner == jnp.uint32(shard_id))
    else:
        mine = valid
    b1 = (h & bmask).astype(jnp.int32)
    b2 = (mix32_jnp(h ^ _CUCKOO_SALT) & bmask).astype(jnp.int32)

    # A key is stored at most once, so the two rounds' contributions are
    # disjoint and sum exactly — except when b1 == b2 (same row gathered
    # twice), which the second round masks out.
    result = jnp.zeros(hi.shape, dtype=jnp.int32)
    for bkt, mask in ((b1, mine), (b2, mine & (b2 != b1))):
        khi = key_hi[bkt]                      # [B, P, W] row gather
        klo = key_lo[bkt]
        hitlane = (mask[..., None] & (khi == hi[..., None])
                   & (klo == lo[..., None]))
        result = result + jnp.sum(jnp.where(hitlane, val[bkt], 0), axis=-1)
    return result
