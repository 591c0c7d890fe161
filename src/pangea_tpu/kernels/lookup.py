"""On-device hash-and-lookup (SURVEY.md C10), jnp path.

The index's open-addressing table lives in HBM as dense uint32/int32 arrays;
probing is a vectorized gather over the whole [B, P] k-mer batch per probe
round, iterated with ``lax.while_loop`` so the common case (hit or empty on
round 1–2) stops early instead of paying max_probe rounds. Ownership check
implements the sharded-index rule of SEMANTICS.md §5.1: a shard probes only
k-mers whose top hash bits name it, everything else reports taxon 0 and is
merged by a later psum.

Bit-exactness contract: identical to `Index.lookup_np` (SEMANTICS.md §4–§5).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_GOLD = jnp.uint32(0x9E3779B9)
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


def lookup_jnp(hi, lo, valid, key_hi, key_lo, val, *, max_probe: int,
               n_shards: int = 1, shard_id=0):
    """Probe one (possibly sharded) table.

    hi/lo/valid: uint32/bool [B, P] from extract_kmers_jnp.
    key_hi/key_lo: uint32 [S]; val: int32 [S] — THIS shard's table.
    Returns taxon int32 [B, P] (0 = miss, not owned, or invalid).
    """
    S = key_hi.shape[0]
    smask = jnp.uint32(S - 1)
    h = hash32_jnp(hi, lo)
    if n_shards > 1:
        log2n = n_shards.bit_length() - 1
        owner = h >> jnp.uint32(32 - log2n)
        mine = valid & (owner == jnp.uint32(shard_id))
    else:
        mine = valid
    slot0 = (h & smask).astype(jnp.int32)

    # Fixed-trip fori_loop rather than a data-dependent while_loop: the
    # early-exit condition would force a device→host sync per probe round
    # (and hangs outright on the axon PJRT backend); max_probe is a small
    # exact bound from the index header, and dead rounds are cheap masked
    # gathers. The Pallas kernel later removes even these.
    def body(i, state):
        slot, alive, result = state
        khi = key_hi[slot]
        klo = key_lo[slot]
        hit = alive & (khi == hi) & (klo == lo)
        empty = khi == _EMPTY_HI
        result = jnp.where(hit, val[slot], result)
        alive = alive & ~(hit | empty)
        slot = ((slot.astype(jnp.uint32) + jnp.uint32(1)) & smask).astype(jnp.int32)
        return slot, alive, result

    _, _, taxon = jax.lax.fori_loop(
        0, max_probe, body,
        (slot0, mine, jnp.zeros(hi.shape, dtype=jnp.int32)),
    )
    return taxon
