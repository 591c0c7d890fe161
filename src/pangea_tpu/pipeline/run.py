"""Pipeline driver (SURVEY.md C17, L6): the host-side orchestration loop.

``run_classify`` realizes the SURVEY.md §4.1 call stack: bring up the mesh,
place the index(es) in HBM once, then stream fixed-shape read batches
through the jitted shard_map classify step — host does parse/trim/demux/pad
(CPU) while the device crunches, results drain to per-sample assignment
TSVs, the manifest checkpoints progress after every durably-written batch,
and summaries/cohort tables are derived from the TSVs at the end (which
makes resume trivially bit-safe).

``run_build`` is the offline §4.2 stack: genomes → canonical k-mers →
LCA-dedupe → dense table → versioned on-disk index.
"""
from __future__ import annotations

import json
import os
import queue
import sys
import threading
import time
from collections import deque

import numpy as np

from ..classify.engine import DeviceIndex, pad_batch
from ..classify.merge import merge_multik_np
from ..config import RunConfig, dump_config
from ..index import Index, build_index
from ..io import DemuxConfig, TrimConfig, demux_batch, read_batches, trim_batch
from ..io.fastx import FastxReader
from ..report import (AssignmentRecord, read_assignments, write_assignments,
                      write_cohort_summary, write_summary)
from ..report import stats as report_stats
from ..taxonomy import Taxonomy
from .checkpoint import Manifest


# --------------------------------------------------------------------- build
def load_taxonomy_any(path: str, names_dmp: str | None = None) -> Taxonomy:
    if names_dmp:
        return Taxonomy.load_ncbi(path, names_dmp)
    if path.endswith(".npz"):
        return Taxonomy.load(path)
    return Taxonomy.load_tsv(path)


def _genomes_from_fasta(paths, taxonomy: Taxonomy, taxid_map: dict | None):
    """Yield (codes, dense_taxon) from reference FASTAs. Taxon comes from a
    ``taxid=N`` key in the header or from the seqid→taxid map; raw NCBI ids
    are translated when the taxonomy carries a raw_to_dense table."""
    raw_to_dense = getattr(taxonomy, "raw_to_dense", None)
    for path in paths:
        for rid, codes, _ in FastxReader(path):
            taxid = None
            if taxid_map and rid in taxid_map:
                taxid = int(taxid_map[rid])
            elif "taxid=" in rid:
                taxid = int(rid.split("taxid=")[1].split("|")[0].split()[0])
            if taxid is None:
                raise ValueError(f"{path}: no taxid for sequence {rid!r} "
                                 "(use header 'taxid=N' or --taxid-map)")
            if raw_to_dense is not None:
                taxid = raw_to_dense[taxid]
            yield codes, taxid


def run_build(refs: list[str], taxonomy_path: str, k: int, out: str,
              w: int = 1, names_dmp: str | None = None,
              taxid_map_path: str | None = None,
              load_factor: float = 0.5) -> Index:
    tax = load_taxonomy_any(taxonomy_path, names_dmp)
    taxid_map = None
    if taxid_map_path:
        taxid_map = {}
        with open(taxid_map_path) as fh:
            for line in fh:
                a, b = line.split()[:2]
                taxid_map[a] = int(b)
    t0 = time.time()
    idx = build_index(_genomes_from_fasta(refs, tax, taxid_map), tax, k=k,
                      w=w, load_factor=load_factor,
                      progress=lambda n: print(
                          f"[build] {n} genomes scanned", file=sys.stderr))
    idx.save(out)
    print(f"[build] {idx} in {time.time()-t0:.1f}s -> {out}",
          file=sys.stderr)
    return idx


# ------------------------------------------------------------------ classify
def _prefetch(gen, maxsize: int = 2):
    """Run `gen` on a background thread, buffering up to `maxsize` items —
    overlaps host-side parse/encode with device compute (SURVEY.md C17)."""
    q: queue.Queue = queue.Queue(maxsize=maxsize)
    _END = object()

    def worker():
        try:
            for item in gen:
                q.put(item)
            q.put(_END)
        except BaseException as e:  # surfaced on the consumer side
            q.put(e)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


class _SampleSink:
    """Per-sample assignment writer with durable-offset tracking."""

    def __init__(self, out_dir: str, sample: str, taxonomy: Taxonomy,
                 resume: bool):
        self.path = os.path.join(out_dir, f"{sample}.assign.tsv")
        self.sample = sample
        self.taxonomy = taxonomy
        mode = "a" if resume and os.path.exists(self.path) else "w"
        self.fh = open(self.path, mode)

    def write(self, records) -> None:
        from ..report.writers import format_assignment
        for r in records:
            self.fh.write(format_assignment(r, self.taxonomy))

    def offset(self) -> int:
        self.fh.flush()
        os.fsync(self.fh.fileno())
        return self.fh.tell()

    def close(self) -> None:
        self.fh.close()


def run_classify(cfg: RunConfig, progress=True) -> dict:
    """Execute a classify run; returns run metrics."""
    import jax

    from ..dist import (MeshConfig, choose_mesh, make_mesh, place_index,
                        make_sharded_classify_fn)
    from ..dist.mesh import batch_sharding

    os.makedirs(cfg.classify.out_dir, exist_ok=True)
    dump_config(cfg, os.path.join(cfg.classify.out_dir, "run_config.json"))

    indexes = [Index.load(p) for p in cfg.classify.index]
    if not indexes:
        raise ValueError("classify.index must name at least one index")
    tax = indexes[0].taxonomy
    for ix in indexes[1:]:
        if ix.meta.taxonomy_hash != indexes[0].meta.taxonomy_hash:
            raise ValueError("multi-k indexes built against different "
                             "taxonomies")

    # Mesh bring-up (SURVEY.md §4.3).
    n_dev = jax.device_count()
    if cfg.mesh.n_data and cfg.mesh.n_shard:
        mcfg = MeshConfig(cfg.mesh.n_data, cfg.mesh.n_shard)
    else:
        budget = int(cfg.mesh.per_device_hbm_budget_gb * (1 << 30))
        mcfg = choose_mesh(n_dev, max(ix.nbytes for ix in indexes), budget)
    mesh = make_mesh(mcfg)
    paired = bool(cfg.input.mates)
    dis = [place_index(ix, mesh, cfg.classify.confidence_threshold)
           for ix in indexes]
    fns = [make_sharded_classify_fn(di.cfg, mesh, paired=paired)
           for di in dis]
    bsh = batch_sharding(mesh)

    # Batch rows must split evenly along the data axis.
    B = max(cfg.input.batch_size - cfg.input.batch_size % mcfg.n_data,
            mcfg.n_data)
    L = cfg.input.max_read_len

    trim_cfg = TrimConfig(min_qual=cfg.trim.min_qual, window=cfg.trim.window,
                          min_len=cfg.trim.min_len, max_len=cfg.trim.max_len)
    demux_cfg = (DemuxConfig(barcodes=tuple(map(tuple, cfg.demux.barcodes)),
                             max_mismatch=cfg.demux.max_mismatch)
                 if cfg.demux.barcodes else None)

    manifest = Manifest.load_or_new(
        os.path.join(cfg.classify.out_dir, "manifest.json"),
        cfg.classify.resume)
    if cfg.classify.resume:
        manifest.truncate_outputs()

    sinks: dict[str, _SampleSink] = {}

    def sink_for(sample: str) -> _SampleSink:
        if sample not in sinks:
            sinks[sample] = _SampleSink(cfg.classify.out_dir, sample, tax,
                                        cfg.classify.resume)
        return sinks[sample]

    metrics_path = os.path.join(cfg.classify.out_dir, "metrics.jsonl")
    metrics_fh = open(metrics_path, "a" if cfg.classify.resume else "w")
    totals = {"reads": 0, "classified": 0, "batches": 0}
    t_start = time.time()

    # Tracing/profiling (SURVEY.md §6): PANGEA_PROFILE=<dir> wraps the
    # steady-state loop in a jax.profiler trace (xprof/perfetto — shows the
    # lookup gathers, collectives, and H2D overlap).
    profile_dir = os.environ.get("PANGEA_PROFILE")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    def classify_launch(bases, mates):
        """Dispatch the device step(s); returns LAZY device outputs so the
        host can overlap parse/drain with compute (one-deep pipeline)."""
        dev_b = jax.device_put(bases, bsh)
        dev_m = jax.device_put(mates, bsh) if paired else None
        outs = []
        for fn in fns:
            o = fn(dis[len(outs)].tables, dev_b, dev_m) if paired else \
                fn(dis[len(outs)].tables, dev_b)
            outs.append(o)
        return outs

    def classify_resolve(outs):
        outs_np = [{k: np.asarray(v) for k, v in o.items()} for o in outs]
        res = outs_np[0]
        for o2 in outs_np[1:]:
            res = merge_multik_np(res, o2, tax)
        return res

    files = list(cfg.input.reads)
    mates = list(cfg.input.mates) if paired else [None] * len(files)
    samples = list(cfg.input.samples) if cfg.input.samples else \
        [os.path.basename(f).split(".")[0] for f in files]

    from ..io.native import native_available, read_batches_native
    use_native = native_available() and not os.environ.get("PANGEA_NO_NATIVE")

    # One-deep launch/drain pipeline: while batch i computes on device, the
    # host drains batch i-1 (TSV writes) and the prefetch thread parses
    # batch i+1 (SURVEY.md C17 streaming double-buffer).
    inflight: deque = deque()

    def drain_one():
        item = inflight.popleft()
        offsets = {}
        n_classified = 0
        t_drain0 = time.time()
        for sample, ids_part, outs in item["parts"]:
            res = classify_resolve(outs)
            recs = [AssignmentRecord(ids_part[i], int(res["taxon"][i]),
                                     int(res["best"][i]),
                                     int(res["nvalid"][i]))
                    for i in range(len(ids_part))]
            n_classified += sum(1 for r in recs if r.taxon != 0)
            sk = sink_for(sample)
            sk.write(recs)
            offsets[sk.path] = sk.offset()
        manifest.record_batch(item["fpath"], item["n_in"], offsets)
        dt = time.time() - item["t0"]
        totals["reads"] += item["n_in"]
        totals["classified"] += n_classified
        totals["batches"] += 1
        line = {"file": item["fpath"], "batch": totals["batches"],
                "reads": item["n_in"], "sec": round(dt, 4),
                "launch_sec": round(item["t_launch"], 4),
                "drain_sec": round(time.time() - t_drain0, 4),
                "reads_per_sec": round(item["n_in"] / dt, 1),
                "cum_reads": totals["reads"],
                "pct_classified": round(
                    100.0 * totals["classified"]
                    / max(totals["reads"], 1), 2)}
        metrics_fh.write(json.dumps(line) + "\n")
        metrics_fh.flush()
        if progress:
            print(f"[classify] {line}", file=sys.stderr)

    for fpath, mpath, fsample in zip(files, mates, samples):
        done = manifest.reads_done(fpath)
        skipped = 0
        batches = (read_batches_native(fpath, B, L, mate_path=mpath,
                                       sample=fsample) if use_native else
                   read_batches(fpath, B, mate_path=mpath, sample=fsample))
        for batch in _prefetch(batches):
            n_in = len(batch)
            if skipped + n_in <= done:
                skipped += n_in
                continue
            if skipped < done:  # partial skip within this batch
                cut = done - skipped
                batch.padded = batch.mate_padded = None
                batch.ids = batch.ids[cut:]
                batch.seqs = batch.seqs[cut:]
                if batch.quals is not None:
                    batch.quals = batch.quals[cut:]
                if batch.mate_seqs is not None:
                    batch.mate_seqs = batch.mate_seqs[cut:]
                if batch.mate_quals is not None:
                    batch.mate_quals = batch.mate_quals[cut:]
                skipped = done
            t0 = time.time()
            batch = trim_batch(batch, trim_cfg)
            parts = (demux_batch(batch, demux_cfg) if demux_cfg
                     else {fsample: batch})
            launched = []
            for sample, part in sorted(parts.items()):
                if not len(part):
                    continue
                if part.padded is not None and part.padded.shape == (B, L):
                    bases = part.padded        # native ingest fast path
                    mb = part.mate_padded if paired else None
                else:
                    bases = pad_batch(part.seqs, B, L)
                    mb = pad_batch(part.mate_seqs, B, L) if paired else None
                launched.append((sample, part.ids,
                                 classify_launch(bases, mb)))
            inflight.append({"fpath": fpath, "n_in": n_in, "t0": t0,
                             "t_launch": time.time() - t0,
                             "parts": launched})
            # Drain-after-launch keeps exactly one batch in flight; the
            # manifest still records batches in order (FIFO).
            if len(inflight) > 1:
                drain_one()
    while inflight:
        drain_one()
    if profile_dir:
        jax.profiler.stop_trace()

    for sk in sinks.values():
        sk.close()
    metrics_fh.close()

    # Summaries from the durable TSVs (resume-safe by construction).
    sample_taxa = {}
    sample_stats = {}
    for sample, sk in sorted(sinks.items()):
        recs = read_assignments(sk.path)
        taxa = np.array([r.taxon for r in recs], dtype=np.int64)
        sample_taxa[sample] = taxa
        write_summary(os.path.join(cfg.classify.out_dir,
                                   f"{sample}.summary.tsv"), taxa, tax)
        from ..report.writers import summarize
        direct, _ = summarize(taxa, tax)
        sample_stats[sample] = report_stats.sample_stats(direct[1:])
    if len(sample_taxa) > 1:
        write_cohort_summary(
            os.path.join(cfg.classify.out_dir, "cohort.summary.tsv"),
            sample_taxa, tax)
    with open(os.path.join(cfg.classify.out_dir, "stats.json"), "w") as fh:
        json.dump(sample_stats, fh, indent=2, sort_keys=True)

    wall = time.time() - t_start
    result = {"reads": totals["reads"], "wall_sec": round(wall, 3),
              "reads_per_sec": round(totals["reads"] / max(wall, 1e-9), 1),
              "pct_classified": round(100.0 * totals["classified"]
                                      / max(totals["reads"], 1), 2),
              "mesh": {"data": mcfg.n_data, "shard": mcfg.n_shard},
              "samples": sorted(sinks)}
    with open(os.path.join(cfg.classify.out_dir, "run_summary.json"),
              "w") as fh:
        json.dump(result, fh, indent=2, sort_keys=True)
    return result
