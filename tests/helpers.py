"""Shared fixtures-by-convention for the test suite (SURVEY.md §5)."""
from __future__ import annotations

import numpy as np

from pangea_tpu.index import Index, build_index
from pangea_tpu.utils import datagen


def small_world(k=21, seed=0, genome_len=3000, n_reads=200, read_len=120,
                n_prob=0.02, paired=False, w=1):
    """Taxonomy + genomes + index + reads with planted truth."""
    tax = datagen.make_taxonomy(seed=seed)
    genomes = datagen.make_genomes(tax, genome_len=genome_len, seed=seed + 1)
    idx = build_index(genomes, tax, k=k, w=w)
    rs = datagen.sample_reads(genomes, n_reads, read_len=read_len,
                              n_prob=n_prob, paired=paired, seed=seed + 2)
    return tax, genomes, idx, rs


def chain_taxonomy(depth=12):
    """Pathological single-chain tree root→...→leaf (SURVEY.md §5 fixtures)."""
    from pangea_tpu.taxonomy import Taxonomy
    parent = np.arange(depth + 1, dtype=np.int32) - 1
    parent[0] = 0
    parent[1] = 1
    rank = np.zeros(depth + 1, dtype=np.int8)
    rank[1] = 1
    names = ["unclassified"] + [f"n{i}" for i in range(1, depth + 1)]
    return Taxonomy(parent=parent, rank=rank, names=names)
