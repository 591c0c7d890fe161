from .semantics_np import (
    AMBIG,
    canonical_kmers,
    encode_bases,
    hash32_np,
    mix32_np,
    disjoint_query_minimizers,
    minimizer_mask,
    revcomp_codes,
)

__all__ = [
    "AMBIG", "canonical_kmers", "encode_bases", "hash32_np", "mix32_np",
    "disjoint_query_minimizers", "minimizer_mask", "revcomp_codes",
]
