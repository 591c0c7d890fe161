"""Batch-size sweep for the config-4 e2e pipeline (VERDICT r3 #4).

DESIGN fact 6 (r3) measured superlinear DEVICE step growth past B=16384,
yet the shipped configs pinned batch_size=131072 on an unmeasured hunch
about the tunnel's fixed per-transfer cost. This sweep runs the REAL
config-4 job (10M reads, fused multi-k, fast path) at each batch size and
records BOTH e2e reads/s (weather-exposed) and the new
device_reads_per_sec (median marginal ready-gap rate — weather-immune),
repeated REPS times. Ships the winner into configs/*.json.

Run on the real chip, single process: python experiments/sweep_batch.py
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BATCHES = (16384, 32768, 65536, 131072, 262144, 524288)
REPS = 2
ART = os.path.join(REPO, "docs", "artifacts")


def run_once(batch: int, rep: int) -> dict:
    out = f"/tmp/c4/out_b{batch}_{rep}"
    subprocess.run(["rm", "-rf", out], check=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = "src:/root/.axon_site"
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "pangea_tpu.cli", "classify",
         "--config", "configs/config4_multik.json",
         'input.reads=["/tmp/c4/reads_1.fastq"]',
         'classify.index=["/tmp/c4/idx21w8","/tmp/c4/idx31w8"]',
         f"classify.out_dir={out}", "input.max_read_len=150",
         f"input.batch_size={batch}"],
        env=env, cwd=REPO, capture_output=True, text=True)
    if r.returncode != 0:
        return {"batch": batch, "rep": rep, "error": r.stderr[-500:]}
    s = json.load(open(os.path.join(out, "run_summary.json")))
    return {"batch": batch, "rep": rep,
            "e2e_reads_per_sec": s["reads_per_sec"],
            "device_reads_per_sec": s.get("device_reads_per_sec"),
            "compile_sec": s.get("compile_sec"),
            "wall_sec": s["wall_sec"],
            "sweep_wall": round(time.time() - t0, 1)}


def main():
    rows = []
    for batch in BATCHES:
        for rep in range(REPS):
            row = run_once(batch, rep)
            print(json.dumps(row), flush=True)
            rows.append(row)
    ok = [r for r in rows if "error" not in r
          and r.get("device_reads_per_sec")]
    best = {}
    for r in ok:
        best.setdefault(r["batch"], []).append(r)
    table = {b: {"device_reads_per_sec":
                 max(x["device_reads_per_sec"] for x in v),
                 "e2e_reads_per_sec":
                 [x["e2e_reads_per_sec"] for x in v]}
             for b, v in sorted(best.items())}
    result = {"rows": rows, "by_batch": table,
              "note": ("device_reads_per_sec is the weather-immune gate; "
                       "e2e carries the tunnel's 2-4x spread")}
    os.makedirs(ART, exist_ok=True)
    with open(os.path.join(ART, "batch_sweep_r04.json"), "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
    print(json.dumps({"by_batch": table}, sort_keys=True), flush=True)


if __name__ == "__main__":
    main()
