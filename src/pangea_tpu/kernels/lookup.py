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


def fuse_table(key_hi, key_lo, val):
    """[NB, W] ×3 arrays → one uint32 [NB, 3W] row [hi×W | lo×W | val×W].
    One lookup then gathers ONE contiguous 384 B row — same measured cost
    per row as a 96 B gather on TPU v5e, and one XLA gather total."""
    import numpy as np
    return np.concatenate(
        [np.asarray(key_hi, dtype=np.uint32),
         np.asarray(key_lo, dtype=np.uint32),
         np.asarray(val, dtype=np.int32).view(np.uint32)], axis=-1)


def lookup_jnp(hi, lo, valid, fused, stash, *, n_shards: int = 1,
               shard_id=0):
    """Probe one (possibly sharded) single-probe table (SEMANTICS.md §5 v5).

    hi/lo/valid: uint32/bool [B, P] (or flat [N]) from extract_kmers_jnp.
    fused: uint32 [NB, 3W] fused rows (fuse_table) — THIS shard's table.
    stash: uint32 [3, S] overflow rows (hi, lo, val-bits); S may be 0;
        padding entries carry hi == 0xFFFFFFFF (never match a valid k-mer).
    Returns taxon int32 like hi (0 = miss, not owned, or invalid).
    """
    nb = fused.shape[0]
    W = fused.shape[1] // 3
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

    rows = fused[b]                            # [N, 3W] — THE row gather
    khi = rows[:, 0:W]
    klo = rows[:, W:2 * W]
    v = jax.lax.bitcast_convert_type(rows[:, 2 * W:3 * W], jnp.int32)
    hitlane = (mine[:, None] & (khi == hi[:, None]) & (klo == lo[:, None]))
    result = jnp.sum(jnp.where(hitlane, v, 0), axis=-1)

    S = stash.shape[1]
    if S:                                       # parallel stash scan (VPU)
        s_hi = stash[0]
        s_lo = stash[1]
        s_v = jax.lax.bitcast_convert_type(stash[2], jnp.int32)
        shit = (mine[:, None] & (hi[:, None] == s_hi[None, :])
                & (lo[:, None] == s_lo[None, :]))
        result = result + jnp.sum(jnp.where(shit, s_v[None, :], 0), axis=-1)
    return result.reshape(shape)
