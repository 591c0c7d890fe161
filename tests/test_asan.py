"""AddressSanitizer run of the native C++ io path (SURVEY.md §6 sanitizers;
VERDICT r1 #9). Builds the asan target and drives parse + packed batches +
bulk TSV writes through it in a subprocess (LD_PRELOAD so asan's runtime
loads before Python). Skipped when g++/libasan are unavailable.
"""
import os
import shutil
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE = os.path.join(_REPO, "native")

_SCRIPT = r"""
import os
import numpy as np
from pangea_tpu.io.native import (NativeFastxReader, write_assignments_native,
                                  _ID_STRIDE, native_available)
assert native_available(), "asan lib failed to load"
from pangea_tpu.utils import datagen
tax = datagen.make_taxonomy(seed=0)
genomes = datagen.make_genomes(tax, genome_len=2000, seed=1)
rs = datagen.sample_reads(genomes, 500, read_len=137, n_prob=0.05, seed=2)
path = os.environ["TD"] + "/r.fastq"
datagen.write_fastq(path, rs, mate=1)
import gzip, shutil as sh
with open(path, "rb") as fi, gzip.open(path + ".gz", "wb") as fo:
    sh.copyfileobj(fi, fo)
for p in (path, path + ".gz"):
    r = NativeFastxReader(p, 128, 150, want_quals=True)
    total = 0
    while True:
        b = r.next_batch_packed()
        if b is None:
            break
        n, ids, rows, lens, quals = b
        total += n
    r.close()
    assert total == 500, (p, total)
taxa = np.arange(500, dtype=np.int32) % (tax.num_taxa + 1)
best = np.ones(500, np.int32); nval = np.full(500, 100, np.int32)
r = NativeFastxReader(path, 512, 150)
n, ids, rows, lens, quals = r.next_batch_packed()
write_assignments_native(os.environ["TD"] + "/o.tsv", False, ids,
                         _ID_STRIDE, n, taxa[:n], best[:n], nval[:n], tax,
                         strip_mate_suffix=True, do_fsync=True)
r.close()
print("ASAN-RUN-OK")
"""


def _asan_rt() -> str | None:
    try:
        p = subprocess.run(["gcc", "-print-file-name=libasan.so"],
                           capture_output=True, text=True).stdout.strip()
        return p if p and os.path.exists(p) else None
    except FileNotFoundError:
        return None


@pytest.mark.skipif(shutil.which("g++") is None or _asan_rt() is None,
                    reason="g++/libasan unavailable")
def test_native_io_under_asan(tmp_path):
    r = subprocess.run(["make", "-C", _NATIVE, "asan"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.join(_REPO, "src")
    env["LD_PRELOAD"] = _asan_rt()
    env["PANGEA_IO_LIB"] = os.path.join(_NATIVE, "libpangea_io_asan.so")
    # Python itself leaks-by-design at exit; we want memory ERRORS only.
    env["ASAN_OPTIONS"] = "detect_leaks=0:abort_on_error=1"
    env["TD"] = str(tmp_path)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "-c", _SCRIPT], env=env, cwd=_REPO,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-3000:])
    assert "ASAN-RUN-OK" in r.stdout
    assert "AddressSanitizer" not in r.stderr
