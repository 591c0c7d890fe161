"""Continuous TPU-backend parity (VERDICT r1 #8).

The repo's central claim — device classify is bit-identical to the golden
numpy model on EVERY backend — is verified on CPU by the whole suite
(conftest forces the CPU backend); this test re-runs the core parity check
on the real TPU in a subprocess (the backend choice is process-wide, so it
cannot run in this process). Skipped when no TPU plugin is present or
PANGEA_TPU_TESTS=0.
"""
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import numpy as np
import jax
assert jax.devices()[0].platform != "cpu", jax.devices()
from pangea_tpu.classify.engine import DeviceIndex, make_classify_fn, \
    pad_batch
from pangea_tpu.golden import classify_reads_golden
from pangea_tpu.index import build_index
from pangea_tpu.utils import datagen

tax = datagen.make_taxonomy(seed=0)
genomes = datagen.make_genomes(tax, genome_len=3000, seed=1)
rs = datagen.sample_reads(genomes, 256, read_len=120, n_prob=0.02,
                          paired=True, seed=2)
for w in (1, 8):
    idx = build_index(genomes, tax, k=21, w=w)
    di = DeviceIndex.from_index(idx, confidence_threshold=0.05)
    fn = make_classify_fn(di.cfg, paired=True)
    b1 = pad_batch(rs.seqs, 256, 120)
    b2 = pad_batch(rs.mates, 256, 120)
    out = fn(di.tables, jax.device_put(b1), jax.device_put(b2))
    gold = classify_reads_golden(rs.seqs, idx, 0.05, mates=rs.mates)
    taxa = np.asarray(out["taxon"]); best = np.asarray(out["best"])
    nval = np.asarray(out["nvalid"])
    for i, g in enumerate(gold):
        assert (int(taxa[i]), int(best[i]), int(nval[i])) == \
            (g.taxon, g.best, g.nvalid), (w, i)
print("TPU-PARITY-OK", jax.devices()[0])
"""


def _tpu_plugin_present() -> bool:
    return os.path.exists("/opt/axon/libaxon_pjrt.so")


@pytest.mark.skipif(not _tpu_plugin_present() or
                    os.environ.get("PANGEA_TPU_TESTS") == "0",
                    reason="no TPU plugin (or PANGEA_TPU_TESTS=0)")
def test_golden_parity_on_tpu_backend():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("PANGEA_TPU_PLATFORM", None)
    # fresh XLA_FLAGS: no forced host devices on the TPU run
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.path.join(_REPO, "src") + ":/root/.axon_site"
    r = subprocess.run([sys.executable, "-c", _SCRIPT], env=env, cwd=_REPO,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "TPU-PARITY-OK" in r.stdout
