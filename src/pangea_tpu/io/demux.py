"""Demultiplex / sample binning (SURVEY.md C4 — multi-sample cohorts,
driver config 5). Host-side.

Reads whose first ``len(barcode)`` bases exactly match a sample's barcode
(after encoding; barcode comparison is on base codes, ambiguity codes never
match) are binned to that sample with the barcode stripped; non-matching
reads go to sample ``"undetermined"`` unstripped. ``max_mismatch`` allows
per-barcode Hamming slack (ties → first barcode in config order).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..core import encode_bases
from .fastx import ReadBatch

UNDETERMINED = "undetermined"


@dataclass(frozen=True)
class DemuxConfig:
    barcodes: tuple[tuple[str, str], ...]  # (sample_name, barcode) pairs
    max_mismatch: int = 0


def demux_batch(batch: ReadBatch, cfg: DemuxConfig) -> dict[str, ReadBatch]:
    """Split one batch into per-sample batches (dict keyed by sample)."""
    codes = [(name, encode_bases(bc)) for name, bc in cfg.barcodes]
    bins: dict[str, list[int]] = {name: [] for name, _ in cfg.barcodes}
    bins[UNDETERMINED] = []
    strip: dict[int, int] = {}
    for i, seq in enumerate(batch.seqs):
        assigned = None
        for name, bc in codes:
            if seq.size < bc.size:
                continue
            mism = int((seq[:bc.size] != bc).sum())
            if mism <= cfg.max_mismatch:
                assigned = (name, bc.size)
                break
        if assigned is None:
            bins[UNDETERMINED].append(i)
        else:
            bins[assigned[0]].append(i)
            strip[i] = assigned[1]
    out: dict[str, ReadBatch] = {}
    paired = batch.mate_seqs is not None
    for name, idxs in bins.items():
        if not idxs:
            continue
        out[name] = ReadBatch(
            ids=[batch.ids[i] for i in idxs],
            seqs=[batch.seqs[i][strip.get(i, 0):] for i in idxs],
            quals=[batch.quals[i][strip.get(i, 0):] for i in idxs]
            if batch.quals is not None else None,
            mate_seqs=[batch.mate_seqs[i] for i in idxs] if paired else None,
            mate_quals=[batch.mate_quals[i] for i in idxs]
            if (paired and batch.mate_quals is not None) else None,
            sample=name,
        )
    return out
