from .encode import extract_kmers_jnp
from .lookup import lookup_jnp, lookup_q8_jnp, mix32_jnp, hash32_jnp
from .minimize import select_minimizers_jnp
from .score import score_reads_jnp, score_reads_tin_jnp

__all__ = [
    "extract_kmers_jnp", "lookup_jnp", "mix32_jnp", "hash32_jnp",
    "select_minimizers_jnp", "score_reads_jnp",
    "score_reads_tin_jnp", "lookup_q8_jnp",
]
