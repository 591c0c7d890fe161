"""On-device k-mer extraction (SURVEY.md C9), jnp path.

TPU has no native 64-bit integers (jax x64 stays off), so canonical k-mers
live as ``(hi, lo)`` uint32 pairs throughout the device path — the same
split the index table stores (SEMANTICS.md §2, §5). The rolling C loop of a
classic classifier becomes k static shifted slices accumulated in registers;
XLA fuses the whole extraction into one elementwise program, so the batch is
touched once (HBM-friendly) and everything stays on the VPU.

Bit-exactness contract: identical to `pangea_tpu.core.canonical_kmers`
(tested in tests/test_device_parity.py).
"""
from __future__ import annotations

import jax.numpy as jnp


def extract_kmers_jnp(bases: jnp.ndarray, k: int):
    """bases: int32/uint8 [B, L] codes (0..3 real, 4 = AMBIG/pad).

    Returns (hi, lo, valid): uint32 [B, P], uint32 [B, P], bool [B, P]
    with P = L - k + 1 k-mer positions per SEMANTICS.md §2. Invalid
    positions carry canonical value 0.
    """
    B, L = bases.shape
    P = L - k + 1
    if P <= 0:
        raise ValueError(f"read length {L} shorter than k={k}")
    codes = bases.astype(jnp.uint32)
    valid = jnp.ones((B, P), dtype=bool)
    f_hi = jnp.zeros((B, P), dtype=jnp.uint32)
    f_lo = jnp.zeros((B, P), dtype=jnp.uint32)
    r_hi = jnp.zeros((B, P), dtype=jnp.uint32)
    r_lo = jnp.zeros((B, P), dtype=jnp.uint32)
    for j in range(k):
        c = codes[:, j:j + P]
        valid = valid & (c <= 3)
        c2 = c & jnp.uint32(3)
        cc = jnp.uint32(3) - c2
        # Forward: base j at bit offset 2*(k-1-j) (big-endian in bases).
        s = 2 * (k - 1 - j)
        if s < 32:
            f_lo = f_lo + (c2 << jnp.uint32(s))
        else:
            f_hi = f_hi + (c2 << jnp.uint32(s - 32))
        # Reverse complement: complement of base j at bit offset 2*j.
        t = 2 * j
        if t < 32:
            r_lo = r_lo + (cc << jnp.uint32(t))
        else:
            r_hi = r_hi + (cc << jnp.uint32(t - 32))
    # canonical = min(fwd, rc) on the 64-bit value (SEMANTICS.md §2).
    fwd_le = (f_hi < r_hi) | ((f_hi == r_hi) & (f_lo <= r_lo))
    hi = jnp.where(fwd_le, f_hi, r_hi)
    lo = jnp.where(fwd_le, f_lo, r_lo)
    hi = jnp.where(valid, hi, jnp.uint32(0))
    lo = jnp.where(valid, lo, jnp.uint32(0))
    return hi, lo, valid
