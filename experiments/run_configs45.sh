#!/bin/bash
# Driver configs 4 & 5 end-to-end at 10M reads on the real chip
# (VERDICT r1 #5, r2 #3/#4). Reproducible recipe; artifacts land in
# docs/artifacts/.
#
# Read/reference data (generated once; kept under /tmp):
#   pangea-tpu gen-testdata --out /tmp/c4 --reads 10000000 --bulk \
#       --read-len 150 --genome-len 50000 --n-phyla 4 \
#       --genera-per-phylum 4 --species-per-genus 3 --seed 0
#   pangea-tpu gen-testdata --out /tmp/c5 --reads 10000000 --bulk \
#       --n-samples 4 --read-len 150 --genome-len 50000 --n-phyla 4 \
#       --genera-per-phylum 4 --species-per-genus 3 --seed 9
#
# Indexes are (re)built HERE with --minimizer-w 8: the PRODUCTION regime
# (SEMANTICS.md §3). Round 2 ran these configs on w=1 dense indexes and
# paid ~8x the probes plus the sort-pscore cliff (VERDICT r2 #4); w=1
# remains the parity configuration, exercised by the bench extras and the
# parity test suite, not by the scale runs.
#
# Peak host RSS is recorded per run via resource.getrusage of the child
# (ADVICE r2: /usr/bin/time -v is not in this image).
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=src:/root/.axon_site
ART=docs/artifacts
mkdir -p $ART

# rss_run <logfile> <cmd...>: run cmd, append child peak-RSS to logfile.
rss_run() {
    local log=$1; shift
    python - "$log" "$@" <<'EOF'
import resource, subprocess, sys
log = sys.argv[1]
rc = subprocess.call(sys.argv[2:])
kb = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss
with open(log, "a") as fh:
    fh.write(f"peak_rss_gb={kb/1e6:.2f} cmd={' '.join(sys.argv[2:])[:120]}\n")
sys.exit(rc)
EOF
}

echo "=== build w=8 production indexes ==="
for spec in "c4 21" "c4 31" "c5 21"; do
    set -- $spec
    d=$1; k=$2
    if [ ! -f /tmp/$d/idx${k}w8/meta.json ]; then
        rss_run $ART/configs45_rss.log python -m pangea_tpu.cli build \
            --refs /tmp/$d/refs.fasta --taxonomy /tmp/$d/taxonomy.tsv \
            --k $k --minimizer-w 8 --ways 0 --out /tmp/$d/idx${k}w8
    fi
done

BC=$(python - <<'EOF'
import json
rows = [l.split() for l in open("/tmp/c5/barcodes.tsv")]
print(json.dumps([[n, b] for n, b in rows], separators=(",", ":")))
EOF
)

echo "=== config 4: 10M reads, multi-k k=21/31, single host ==="
rss_run $ART/configs45_rss.log python -m pangea_tpu.cli classify \
    --config configs/config4_multik.json \
    'input.reads=["/tmp/c4/reads_1.fastq"]' \
    'classify.index=["/tmp/c4/idx21w8","/tmp/c4/idx31w8"]' \
    classify.out_dir=/tmp/c4/out input.max_read_len=150 \
    2> >(tail -30 >&2)
cp /tmp/c4/out/run_summary.json $ART/config4_run_summary.json
tail -3 /tmp/c4/out/metrics.jsonl > $ART/config4_metrics_tail.jsonl

echo "=== config 5 control: full uninterrupted cohort run ==="
rm -rf /tmp/c5/out_ctl /tmp/c5/out
rss_run $ART/configs45_rss.log python -m pangea_tpu.cli classify \
    --config configs/config5_cohort.json \
    'input.reads=["/tmp/c5/reads_1.fastq"]' \
    'classify.index=["/tmp/c5/idx21w8"]' \
    "demux.barcodes=$BC" demux.max_mismatch=1 \
    trim.min_qual=20 trim.min_len=50 \
    classify.out_dir=/tmp/c5/out_ctl classify.resume=false \
    input.max_read_len=158 2>/dev/null

echo "=== config 5: cohort run, SIGKILLed mid-stream, then resumed ==="
set +e
python -m pangea_tpu.cli classify --config configs/config5_cohort.json \
    'input.reads=["/tmp/c5/reads_1.fastq"]' \
    'classify.index=["/tmp/c5/idx21w8"]' \
    "demux.barcodes=$BC" demux.max_mismatch=1 \
    trim.min_qual=20 trim.min_len=50 \
    classify.out_dir=/tmp/c5/out input.max_read_len=158 \
    2>/dev/null &
PID=$!
# Kill only once the run is demonstrably mid-stream: poll the MANIFEST's
# recorded (i.e. fsync'd-and-committed) read count — durability runs on
# an async thread now, so metrics.jsonl lines do NOT imply durable
# batches. Numeric-safe (VERDICT r2 weak #4: the old `wc -l || echo`
# form produced non-numeric values while the file was missing, the test
# errored, and the kill fired during compile at 0 durable batches).
# 16 batches x 131072 reads = 2097152 durable reads required.
WANT_DURABLE=2097152
n=0
for i in $(seq 1 900); do
    sleep 1
    n=$(python -c 'import json;print(sum(json.load(open("/tmp/c5/out/manifest.json"))["files"].values()))' 2>/dev/null | tr -dc '0-9')
    n=${n:-0}
    if [ "$n" -ge "$WANT_DURABLE" ]; then break; fi
    if ! kill -0 $PID 2>/dev/null; then break; fi
done
if [ "$n" -lt "$WANT_DURABLE" ]; then
    echo "FATAL: never reached $WANT_DURABLE durable reads (n=$n) — no kill fired" >&2
    kill -9 $PID 2>/dev/null
    exit 1
fi
kill -9 $PID
wait $PID 2>/dev/null
set -e
echo "killed with $n reads durable (>=16 committed batches); resuming"
rss_run $ART/configs45_rss.log python -m pangea_tpu.cli classify \
    --config configs/config5_cohort.json \
    'input.reads=["/tmp/c5/reads_1.fastq"]' \
    'classify.index=["/tmp/c5/idx21w8"]' \
    "demux.barcodes=$BC" demux.max_mismatch=1 \
    trim.min_qual=20 trim.min_len=50 \
    classify.out_dir=/tmp/c5/out input.max_read_len=158 --resume \
    2>/dev/null

echo "=== verify: resumed cohort outputs == control, byte for byte ==="
for f in /tmp/c5/out_ctl/*.assign.tsv /tmp/c5/out_ctl/*.summary.tsv \
         /tmp/c5/out_ctl/cohort.summary.tsv; do
    b=$(basename "$f")
    cmp "$f" "/tmp/c5/out/$b"
done
echo "BYTE-IDENTICAL after mid-run SIGKILL + resume ($n reads durable at kill)"
cp /tmp/c5/out/run_summary.json $ART/config5_run_summary.json
tail -3 /tmp/c5/out/metrics.jsonl > $ART/config5_metrics_tail.jsonl
python - "$n" <<'EOF'
import json, sys
res = {"config5_durable_reads_at_kill": int(sys.argv[1]),
       "config5_resume_byte_identical": True}
with open("docs/artifacts/config5_kill_resume.json", "w") as fh:
    json.dump(res, fh, indent=2)
for n in (4, 5):
    s = json.load(open(f"docs/artifacts/config{n}_run_summary.json"))
    print(f"config{n}:", json.dumps(s, sort_keys=True))
EOF
