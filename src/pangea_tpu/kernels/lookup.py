"""On-device hash-and-lookup (SURVEY.md C10), jnp path.

The index's single-probe bucketized table (SEMANTICS.md §5 v5) lives in HBM
as one fused uint32 [NB, 96] array; a lookup is exactly ONE contiguous
384 B bucket-row gather over the whole query batch plus 32 lane-parallel
compares on the VPU, then a parallel scan of the tiny overflow stash
(usually empty). No data-dependent probe chains and no second round:
measured on TPU v5e (2026-08-18), independent row gathers do NOT overlap,
so the v3/v4 two-choice cuckoo design paid 2x; a 384 B row gathers at the
same fixed per-row cost as a 96 B row, so the wide single bucket is free.
Ownership check implements the sharded-index rule of SEMANTICS.md §5.1: a
shard probes only k-mers whose top hash bits name it, everything else
reports taxon 0 and is merged by a later psum.

Bit-exactness contract: identical to `Index.lookup_np` (SEMANTICS.md §4–§5).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

import numpy as _np

# numpy scalars, NOT jnp: module-level jnp constants would initialize the
# XLA backend at import time, breaking jax.distributed.initialize (which
# must run before any backend touch in multi-process runs).
_GOLD = _np.uint32(0x9E3779B9)
_EMPTY_HI = _np.uint32(0xFFFFFFFF)


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


def fuse_table(key_hi, key_lo, val, tin, tout):
    """[NB, W] ×3 table arrays + taxonomy Euler arrays ([T+1]) → one uint32
    fused row per bucket, carrying the hit taxon's Euler interval so the
    scorer needs NO per-position taxonomy gather (measured ~8 ms per
    million positions even on a tiny taxonomy — gathers cost per element,
    however small the source). Derived at device-load time; not part of
    the on-disk format.

    Two layouts (lookup_jnp infers from the row width):
    - packed  [NB, 4W] = [hi×W | lo×W | val×W | (tin<<16|tout)×W] when the
      taxonomy fits 16-bit Euler stamps (tout ≤ 0xFFFF). W=16 → a 256 B
      row; power-of-two row bytes gather ~3x faster than 320-640 B rows
      on v5e.
    - wide    [NB, 6W] = [hi | lo | val | tin | tout | pad] otherwise
      (row padded to a power-of-two byte size)."""
    import numpy as np
    key_hi = np.asarray(key_hi, dtype=np.uint32)
    val = np.asarray(val, dtype=np.int32)
    tin = np.asarray(tin, dtype=np.int32)
    tout = np.asarray(tout, dtype=np.int32)
    if int(tout.max(initial=0)) <= 0xFFFF:
        pk = (tin[val].astype(np.uint32) << np.uint32(16)) \
            | tout[val].astype(np.uint32)
        return np.concatenate(
            [key_hi, np.asarray(key_lo, dtype=np.uint32),
             val.view(np.uint32), pk], axis=-1)
    pad = np.zeros(key_hi.shape, dtype=np.uint32)
    return np.concatenate(
        [key_hi, np.asarray(key_lo, dtype=np.uint32),
         val.view(np.uint32),
         tin[val].view(np.uint32),
         tout[val].view(np.uint32), pad], axis=-1)


def fuse_stash(stash, tin, tout):
    """uint32 [3, S] (hi, lo, val-bits) → uint32 [5, S] with tin/tout rows
    appended (empty-stash padding keeps val 0 → tin[0]/tout[0], never
    selected because its key_hi is the EMPTY sentinel). The stash is tiny
    and scanned on the VPU, so it keeps the simple unpacked layout."""
    import numpy as np
    stash = np.asarray(stash, dtype=np.uint32)
    sval = stash[2].view(np.int32)
    tin = np.asarray(tin, dtype=np.int32)
    tout = np.asarray(tout, dtype=np.int32)
    return np.concatenate(
        [stash, tin[sval].view(np.uint32)[None, :],
         tout[sval].view(np.uint32)[None, :]], axis=0)


def lookup_jnp(hi, lo, valid, fused, stash, *, n_shards: int = 1,
               shard_id=0, ways: int = 16):
    """Probe one (possibly sharded) single-probe table (SEMANTICS.md §5 v5).

    hi/lo/valid: uint32/bool [B, P] (or flat [N]) from extract_kmers_jnp.
    fused: uint32 [NB, 4W] (packed) or [NB, 6W] (wide) fused rows
        (fuse_table) — THIS shard's table; layout inferred from the row
        width given `ways`.
    stash: uint32 [5, S] overflow rows (fuse_stash); S may be 0; padding
        entries carry hi == 0xFFFFFFFF (never match a valid k-mer).
    Returns (taxon, t_in, t_out), each int32 like hi: the hit taxon
    (0 = miss, not owned, or invalid) and its Euler interval (0 at
    non-hits — callers mask by ``taxon != 0``).
    """
    nb = fused.shape[0]
    W = ways
    packed = fused.shape[1] == 4 * W
    bmask = jnp.uint32(nb - 1)
    shape = hi.shape
    hi = hi.reshape(-1)
    lo = lo.reshape(-1)
    valid = valid.reshape(-1)
    h = hash32_jnp(hi, lo)
    if n_shards > 1:
        log2n = n_shards.bit_length() - 1
        owner = h >> jnp.uint32(32 - log2n)
        mine = valid & (owner == jnp.uint32(shard_id))
    else:
        mine = valid
    b = (h & bmask).astype(jnp.int32)

    rows = fused[b]                            # [N, 4W|6W] — THE row gather
    khi = rows[:, 0:W]
    klo = rows[:, W:2 * W]
    val = jax.lax.bitcast_convert_type(rows[:, 2 * W:3 * W], jnp.int32)
    hitlane = (mine[:, None] & (khi == hi[:, None]) & (klo == lo[:, None]))
    # Masked lane-sums over the same hit mask; XLA fuses them into one
    # pass over the gathered rows.
    taxon = jnp.sum(jnp.where(hitlane, val, 0), axis=-1)
    if packed:
        pk = jnp.sum(jnp.where(hitlane, rows[:, 3 * W:4 * W],
                               jnp.uint32(0)), axis=-1)
        t_in = (pk >> jnp.uint32(16)).astype(jnp.int32)
        t_out = (pk & jnp.uint32(0xFFFF)).astype(jnp.int32)
    else:
        p2 = jax.lax.bitcast_convert_type(rows[:, 3 * W:5 * W], jnp.int32)
        t_in = jnp.sum(jnp.where(hitlane, p2[:, 0:W], 0), axis=-1)
        t_out = jnp.sum(jnp.where(hitlane, p2[:, W:2 * W], 0), axis=-1)

    S = stash.shape[1]
    if S:                                       # parallel stash scan (VPU)
        shit = (mine[:, None] & (hi[:, None] == stash[0][None, :])
                & (lo[:, None] == stash[1][None, :]))
        sv = jax.lax.bitcast_convert_type(stash[2:], jnp.int32)
        taxon = taxon + jnp.sum(jnp.where(shit, sv[0][None, :], 0), axis=-1)
        t_in = t_in + jnp.sum(jnp.where(shit, sv[1][None, :], 0), axis=-1)
        t_out = t_out + jnp.sum(jnp.where(shit, sv[2][None, :], 0), axis=-1)
    return (taxon.reshape(shape), t_in.reshape(shape),
            t_out.reshape(shape))
