"""Checkpoint/resume manifest (SURVEY.md §6).

Classify runs are restartable at batch granularity: after each drained
batch the manifest records, per input file, how many reads have been
durably written to each sample's assignment file (and those files' byte
offsets). Resume truncates assignment files to the recorded offsets (tail
of a partially-written batch is discarded) and skips the recorded number of
reads. Deterministic outputs make resume bit-safe (SEMANTICS.md §11).
"""
from __future__ import annotations

import json
import os
import tempfile


class Manifest:
    def __init__(self, path: str):
        self.path = path
        self.state: dict = {"files": {}, "outputs": {}}

    @classmethod
    def load_or_new(cls, path: str, resume: bool) -> "Manifest":
        m = cls(path)
        if resume and os.path.exists(path):
            with open(path) as fh:
                m.state = json.load(fh)
        return m

    def reads_done(self, input_key: str) -> int:
        return self.state["files"].get(input_key, 0)

    def record_batch(self, input_key: str, n_reads: int,
                     output_offsets: dict[str, int]) -> None:
        self.state["files"][input_key] = \
            self.state["files"].get(input_key, 0) + n_reads
        self.state["outputs"].update(output_offsets)
        self._write()

    def truncate_outputs(self) -> None:
        """On resume: cut assignment files back to their durable offsets."""
        for path, off in self.state["outputs"].items():
            if os.path.exists(path):
                with open(path, "r+b") as fh:
                    fh.truncate(off)

    def _write(self) -> None:
        # Atomic write + fsync so a crash never leaves a torn manifest.
        d = os.path.dirname(self.path) or "."
        fd, tmp = tempfile.mkstemp(dir=d, prefix=".manifest.")
        try:
            with os.fdopen(fd, "w") as fh:
                json.dump(self.state, fh)
                fh.flush()
                os.fsync(fh.fileno())
            os.replace(tmp, self.path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise
