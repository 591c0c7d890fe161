from .fastx import FastxReader, ReadBatch, read_batches, sniff_format
from .trim import TrimConfig, trim_batch
from .demux import DemuxConfig, demux_batch

__all__ = ["FastxReader", "ReadBatch", "read_batches", "sniff_format",
           "TrimConfig", "trim_batch", "DemuxConfig", "demux_batch"]
