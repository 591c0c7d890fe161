#!/bin/bash
# Driver configs 4 & 5 end-to-end at 10M reads on the real chip
# (VERDICT r1 #5). Reproducible recipe; artifacts land in docs/artifacts/.
#
# Inputs (generated first — see configs/README.md):
#   pangea-tpu gen-testdata --out /tmp/c4 --reads 10000000 --bulk \
#       --read-len 150 --genome-len 50000 --n-phyla 4 \
#       --genera-per-phylum 4 --species-per-genus 3 --seed 0
#   pangea-tpu gen-testdata --out /tmp/c5 --reads 10000000 --bulk \
#       --n-samples 4 ... --seed 9        (pooled barcoded cohort file)
#   pangea-tpu build --refs /tmp/c4/refs.fasta ... --k 21 --out /tmp/c4/idx21
#   pangea-tpu build --refs /tmp/c4/refs.fasta ... --k 31 --out /tmp/c4/idx31
#   pangea-tpu build --refs /tmp/c5/refs.fasta ... --k 21 --out /tmp/c5/idx21
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=src:/root/.axon_site
ART=docs/artifacts
mkdir -p $ART

BC=$(python - <<'EOF'
import json
rows = [l.split() for l in open("/tmp/c5/barcodes.tsv")]
print(json.dumps([[n, b] for n, b in rows], separators=(",", ":")))
EOF
)

echo "=== config 4: 10M reads, multi-k k=21/31, single host ==="
python -m pangea_tpu.cli classify \
    --config configs/config4_multik.json \
    'input.reads=["/tmp/c4/reads_1.fastq"]' \
    'classify.index=["/tmp/c4/idx21","/tmp/c4/idx31"]' \
    classify.out_dir=/tmp/c4/out input.max_read_len=150 \
    2> >(tail -30 >&2)
cp /tmp/c4/out/run_summary.json $ART/config4_run_summary.json
tail -3 /tmp/c4/out/metrics.jsonl > $ART/config4_metrics_tail.jsonl

echo "=== config 5 control: full uninterrupted cohort run ==="
python -m pangea_tpu.cli classify --config configs/config5_cohort.json \
    'input.reads=["/tmp/c5/reads_1.fastq"]' \
    'classify.index=["/tmp/c5/idx21"]' \
    "demux.barcodes=$BC" demux.max_mismatch=1 \
    trim.min_qual=20 trim.min_len=50 \
    classify.out_dir=/tmp/c5/out_ctl classify.resume=false \
    input.max_read_len=158 2>/dev/null

echo "=== config 5: cohort run, SIGKILLed mid-stream, then resumed ==="
set +e
python -m pangea_tpu.cli classify --config configs/config5_cohort.json \
    'input.reads=["/tmp/c5/reads_1.fastq"]' \
    'classify.index=["/tmp/c5/idx21"]' \
    "demux.barcodes=$BC" demux.max_mismatch=1 \
    trim.min_qual=20 trim.min_len=50 \
    classify.out_dir=/tmp/c5/out input.max_read_len=158 \
    2>/dev/null &
PID=$!
# Kill once the run is demonstrably mid-stream (some batches durable).
for i in $(seq 1 600); do
    sleep 1
    n=$(wc -l < /tmp/c5/out/metrics.jsonl 2>/dev/null || echo 0)
    if [ "$n" -ge 20 ]; then break; fi
done
kill -9 $PID
wait $PID 2>/dev/null
set -e
echo "killed after $n durable batches; resuming"
python -m pangea_tpu.cli classify --config configs/config5_cohort.json \
    'input.reads=["/tmp/c5/reads_1.fastq"]' \
    'classify.index=["/tmp/c5/idx21"]' \
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
echo "BYTE-IDENTICAL after mid-run SIGKILL + resume"
cp /tmp/c5/out/run_summary.json $ART/config5_run_summary.json
tail -3 /tmp/c5/out/metrics.jsonl > $ART/config5_metrics_tail.jsonl
python - <<'EOF'
import json
for n in (4, 5):
    s = json.load(open(f"docs/artifacts/config{n}_run_summary.json"))
    print(f"config{n}:", json.dumps(s, sort_keys=True))
EOF
