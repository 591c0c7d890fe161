#!/bin/bash
# Config 5 refresh on round-5 shipped code (VERDICT r4 #3): the 100M-read
# 4-sample cohort COMPOSED with a RefSeq+fungal+viral-scale index — the
# 29.8M-minimizer w=8 combined index (/tmp/c5big/idx21w8big, built from
# the cohort refs + 132 Mbp of decoy fungal/viral genomes appended to the
# taxonomy; experiments/extend_c5_world.py). On device it re-lays as a q8
# table at nb 2^20 (0.54 GB) — the deep-gather regime the r5 sorted-sliced
# path serves. Stages:
#   1) 10M-read cohort run -> config5_run_summary.json (replaces the
#      stale round-3 artifact)
#   2) full 100M control run -> config5_run_summary_100m.json
#   3) 100M run SIGKILLed at >=25M durable reads, resumed, outputs
#      byte-compared vs control -> config5_kill_resume_100m.json
# Process topology justification: unchanged from r4 (one physical chip,
# 2 host cores; the multi-process cohort path is proven separately as one
# 2-process jax.distributed job, byte-identical).
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=src:/root/.axon_site
ART=docs/artifacts
D=/tmp/c5big
B=${PANGEA_C5_BATCH:-262144}
LOG=$ART/config5_rss_r05.log
: > $LOG

BC=$(python - <<'EOF'
import json
rows = [l.split() for l in open("/tmp/c5big/barcodes.tsv")]
print(json.dumps([[n, b] for n, b in rows], separators=(",", ":")))
EOF
)

rss_run() {
    local log=$1; shift
    python - "$log" "$@" <<'EOF'
import resource, subprocess, sys
log = sys.argv[1]
rc = subprocess.call(sys.argv[2:])
kb = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss
with open(log, "a") as fh:
    fh.write(f"peak_rss_gb={kb/1e6:.2f} cmd={' '.join(sys.argv[2:])[:140]}\n")
sys.exit(rc)
EOF
}

c5_args=(--config configs/config5_cohort.json
    "classify.index=[\"$D/idx21w8big\"]"
    "demux.barcodes=$BC" demux.max_mismatch=1
    trim.min_qual=20 trim.min_len=50
    "input.batch_size=$B" input.max_read_len=158)

if [ ! -f $D/reads_10m.fastq ]; then
    head -n 40000000 $D/reads_1.fastq > $D/reads_10m.fastq
fi

echo "=== config 5 @10M on shipped code + big index ==="
rm -rf $D/out_10m
rss_run $LOG python -m pangea_tpu.cli classify "${c5_args[@]}" \
    "input.reads=[\"$D/reads_10m.fastq\"]" \
    classify.out_dir=$D/out_10m classify.resume=false \
    2> >(tail -5 >&2)
cp $D/out_10m/run_summary.json $ART/config5_run_summary.json
tail -3 $D/out_10m/metrics.jsonl > $ART/config5_metrics_tail.jsonl

echo "=== config 5 @100M control: full uninterrupted cohort run ==="
rm -rf $D/out_ctl $D/out
rss_run $LOG python -m pangea_tpu.cli classify "${c5_args[@]}" \
    "input.reads=[\"$D/reads_1.fastq\"]" \
    classify.out_dir=$D/out_ctl classify.resume=false \
    2> >(tail -5 >&2)
cp $D/out_ctl/run_summary.json $ART/config5_run_summary_100m.json
tail -3 $D/out_ctl/metrics.jsonl > $ART/config5_metrics_tail_100m.jsonl

echo "=== config 5 @100M: SIGKILL mid-stream at >=25M durable reads ==="
set +e
python -m pangea_tpu.cli classify "${c5_args[@]}" \
    "input.reads=[\"$D/reads_1.fastq\"]" \
    classify.out_dir=$D/out 2>/dev/null &
PID=$!
WANT_DURABLE=25000000
n=0
for i in $(seq 1 2400); do
    sleep 1
    n=$(python -c 'import json;print(sum(json.load(open("/tmp/c5big/out/manifest.json"))["files"].values()))' 2>/dev/null | tr -dc '0-9')
    n=${n:-0}
    if [ "$n" -ge "$WANT_DURABLE" ]; then break; fi
    if ! kill -0 $PID 2>/dev/null; then break; fi
done
if [ "$n" -lt "$WANT_DURABLE" ]; then
    echo "FATAL: never reached $WANT_DURABLE durable reads (n=$n)" >&2
    kill -9 $PID 2>/dev/null
    exit 1
fi
kill -9 $PID
wait $PID 2>/dev/null
set -e
echo "killed with $n reads durable; resuming"
KILLED_AT=$n
rss_run $LOG python -m pangea_tpu.cli classify "${c5_args[@]}" \
    "input.reads=[\"$D/reads_1.fastq\"]" \
    classify.out_dir=$D/out --resume 2> >(tail -5 >&2)

echo "=== verify: resumed outputs == control, byte for byte ==="
for f in $D/out_ctl/*.assign.tsv $D/out_ctl/*.summary.tsv \
         $D/out_ctl/cohort.summary.tsv; do
    b=$(basename "$f")
    cmp "$f" "$D/out/$b"
done
echo "byte-identical: all sample + cohort outputs"

python - "$KILLED_AT" <<'EOF'
import json, sys
killed_at = int(sys.argv[1])
ctl = json.load(open("/tmp/c5big/out_ctl/run_summary.json"))
res = json.load(open("/tmp/c5big/out/run_summary.json"))
man = json.load(open("/tmp/c5big/out/manifest.json"))
art = {
  "scale": ("driver config 5 (BASELINE.json:11) at FULL spec volume, "
            "COMPOSED with a RefSeq+fungal+viral-scale index"),
  "reads_total": ctl["reads"],
  "samples": ctl["samples"],
  "index": {"path": "/tmp/c5big/idx21w8big", "n_kmers": 29778360,
            "k": 21, "w": 8,
            "device_layout": "q8 nb 2^20 (0.54 GB, deep-gather regime)"},
  "batch_size": int(__import__("os").environ.get("PANGEA_C5_BATCH",
                                                 262144)),
  "control_summary": ctl,
  "killed_at_durable_reads": killed_at,
  "resumed_summary": res,
  "manifest_reads_after_resume": sum(man["files"].values()),
  "byte_identical_outputs": True,
  "process_topology": {
    "processes": 1, "chips": 1,
    "justification": ("driver spec says N>=2 hosts; this sandbox has one "
                      "physical chip behind a single-tenant tunnel and 2 "
                      "host cores, so the 100M volume runs 1-process on "
                      "the real chip; the multi-process cohort path is "
                      "proven as one job by run_config5_2proc.sh "
                      "(2M reads, 2-process CPU-sim mesh, byte-identical "
                      "to 1-process)")},
}
json.dump(art, open("docs/artifacts/config5_kill_resume_100m.json", "w"),
          indent=1, sort_keys=True)
print(json.dumps({k: art[k] for k in ("reads_total",
                                      "killed_at_durable_reads",
                                      "manifest_reads_after_resume")}))
EOF
cat $LOG
