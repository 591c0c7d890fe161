#!/bin/bash
# Multi-process cohort path as ONE job (VERDICT r3 #2, second half):
# the full config-5 pipeline — demux + quality trim on the packed fast
# path, manifest, per-sample + cohort reports — over a jax.distributed
# 2-process mesh (localhost TCP = the DCN stand-in, CPU backend), at
# 2M reads. Outputs must be byte-identical to the same job run
# single-process.
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=src:/root/.axon_site
ART=docs/artifacts
D=/tmp/c5_2p
mkdir -p $ART

if [ ! -f $D/reads_1.fastq ]; then
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python -m pangea_tpu.cli gen-testdata --out $D --reads 2000000 --bulk \
        --n-samples 4 --read-len 150 --genome-len 50000 --n-phyla 4 \
        --genera-per-phylum 4 --species-per-genus 3 --seed 9
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python -m pangea_tpu.cli build --refs $D/refs.fasta \
        --taxonomy $D/taxonomy.tsv --k 21 --minimizer-w 8 --ways 0 \
        --out $D/idx21w8
fi

BC=$(python - <<'EOF'
import json
rows = [l.split() for l in open("/tmp/c5_2p/barcodes.tsv")]
print(json.dumps([[n, b] for n, b in rows], separators=(",", ":")))
EOF
)

PORT=$(python -c 'import socket; s=socket.socket(); s.bind(("127.0.0.1",0)); print(s.getsockname()[1]); s.close()')

c5_args=(--config configs/config5_cohort.json
    "input.reads=[\"$D/reads_1.fastq\"]"
    "classify.index=[\"$D/idx21w8\"]"
    "demux.barcodes=$BC" demux.max_mismatch=1
    trim.min_qual=20 trim.min_len=50
    input.batch_size=65536 input.max_read_len=158
    classify.resume=false)

echo "=== single-process control (CPU backend) ==="
rm -rf $D/out_1p $D/out_2p
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
python -m pangea_tpu.cli classify "${c5_args[@]}" \
    classify.out_dir=$D/out_1p 2>/dev/null

echo "=== 2-process run (jax.distributed over localhost TCP) ==="
pids=()
for p in 0 1; do
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python -m pangea_tpu.cli classify "${c5_args[@]}" \
        classify.out_dir=$D/out_2p \
        dist.coordinator=127.0.0.1:$PORT dist.num_processes=2 \
        dist.process_id=$p 2>/dev/null &
    pids+=($!)
done
for pid in "${pids[@]}"; do wait $pid; done

echo "=== verify: 2-process outputs == 1-process, byte for byte ==="
for f in $D/out_1p/*.assign.tsv $D/out_1p/*.summary.tsv \
         $D/out_1p/cohort.summary.tsv; do
    b=$(basename "$f")
    cmp "$f" "$D/out_2p/$b"
done
echo "byte-identical: all sample + cohort outputs"

python - <<'EOF'
import json
one = json.load(open("/tmp/c5_2p/out_1p/run_summary.json"))
two = json.load(open("/tmp/c5_2p/out_2p/run_summary.json"))
art = {"reads": one["reads"], "samples": one["samples"],
       "mesh_2proc": two["mesh"],
       "byte_identical_outputs": True,
       "one_proc_summary": one, "two_proc_summary": two,
       "note": ("full config-5 cohort pipeline (demux+trim fast path, "
                "manifest, cohort reports) as ONE job over a "
                "jax.distributed 2-process mesh, byte-identical to "
                "single-process — the DCN cohort path at pipeline "
                "scale, complementing the 100M single-chip run")}
json.dump(art, open("docs/artifacts/config5_2proc.json", "w"),
          indent=1, sort_keys=True)
print("wrote docs/artifacts/config5_2proc.json")
EOF
