"""On-device hash-and-lookup (SURVEY.md C10), jnp path.

The index's bucketized open-addressing table (SEMANTICS.md §5 v2) lives in
HBM as dense uint32/int32 [NB, 8] arrays; probing is one contiguous bucket
row gather over the whole [B, P] k-mer batch per round plus lane-parallel
compares, and max_probe is ≈1–4 because spill requires a full 8-way bucket.
Ownership check
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
    """Probe one (possibly sharded) bucketized table (SEMANTICS.md §5 v2).

    hi/lo/valid: uint32/bool [B, P] from extract_kmers_jnp.
    key_hi/key_lo: uint32 [NB, W]; val: int32 [NB, W] — THIS shard's table.
    Returns taxon int32 [B, P] (0 = miss, not owned, or invalid).

    One probe round = ONE row gather per array + 8 lane compares on the VPU;
    max_probe (from the index header) is tiny (≈1–4 at 0.7 load) because a
    k-mer spills only past completely-full 8-way buckets — this is the
    bucketization payoff vs the probe chains of a flat table.
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
    bkt0 = (h & bmask).astype(jnp.int32)

    # Unrolled fixed-trip rounds rather than a data-dependent while_loop:
    # early exit would force a device→host sync per round (and hangs on the
    # axon PJRT backend); max_probe is a small exact bound, round ≥2 work is
    # masked row gathers.
    def round_(state, _):
        bkt, alive, result = state
        khi = key_hi[bkt]                      # [B, P, W] row gather
        klo = key_lo[bkt]
        hitlane = (alive[..., None] & (khi == hi[..., None])
                   & (klo == lo[..., None]))
        anyhit = jnp.any(hitlane, axis=-1)
        v = jnp.sum(jnp.where(hitlane, val[bkt], 0), axis=-1)
        result = jnp.where(anyhit, v, result)
        has_empty = jnp.any(khi == _EMPTY_HI, axis=-1)
        alive = alive & ~(anyhit | has_empty)
        bkt = ((bkt.astype(jnp.uint32) + jnp.uint32(1)) & bmask
               ).astype(jnp.int32)
        return (bkt, alive, result), None

    state = (bkt0, mine, jnp.zeros(hi.shape, dtype=jnp.int32))
    if max_probe <= 2:
        for _ in range(max_probe):
            state, _ = round_(state, None)
    else:
        state, _ = jax.lax.scan(round_, state, None, length=max_probe)
    return state[2]
