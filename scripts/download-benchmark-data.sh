#!/usr/bin/env bash
#
# Download the canonical benchmark dataset: ERR532393_1, the FQSqueezer-
# paper Illumina run the reference benches against (~9 GB uncompressed;
# reference analog: scripts/download-benchmark-data.sh).
#
# Offline fallback: --synthetic generates a real-SHAPED corpus instead —
# reads sampled from one genome at 15x coverage with correlated
# random-walk qualities and SRA-style headers (bench.py synth_fastq
# genomic fixture). It is clearly labeled: numbers on it are not
# comparable to the published ERR532393_1 rows, but the block-local
# redundancy structure matches real sequencing runs.
#
# Usage: ./scripts/download-benchmark-data.sh [output_dir] [--synthetic [MB]]

set -euo pipefail

OUTPUT_DIR="${1:-benchmark_data}"
URL="ftp://ftp.sra.ebi.ac.uk/vol1/fastq/ERR532/ERR532393/ERR532393_1.fastq.gz"
FILENAME="ERR532393_1.fastq"
mkdir -p "$OUTPUT_DIR"

if [[ "${2:-}" == "--synthetic" || "${1:-}" == "--synthetic" ]]; then
    MB="${3:-${2#--synthetic}}"
    [[ "$MB" =~ ^[0-9]+$ ]] || MB=1024
    OUT="$OUTPUT_DIR/synthetic_genomic_${MB}mb.fastq"
    if [[ -f "$OUT" ]]; then
        echo "Synthetic corpus already exists: $OUT"
        exit 0
    fi
    echo "Generating ${MB} MB genomic-coverage synthetic FASTQ..."
    python - "$OUT" "$MB" <<'EOF'
import sys
sys.path.insert(0, ".")
from bench import synth_fastq
out, mb = sys.argv[1], int(sys.argv[2])
with open(out, "wb") as f:
    f.write(synth_fastq(mb, genomic=True))
EOF
    ls -lh "$OUT"
    exit 0
fi

if [[ -f "$OUTPUT_DIR/$FILENAME" ]]; then
    echo "Dataset already exists: $OUTPUT_DIR/$FILENAME"
    ls -lh "$OUTPUT_DIR/$FILENAME"
    exit 0
fi

echo "Downloading ERR532393_1 (~3.2 GB compressed, ~9 GB uncompressed)..."
curl -o "$OUTPUT_DIR/${FILENAME}.gz" "$URL"
echo "Decompressing..."
gunzip -f "$OUTPUT_DIR/${FILENAME}.gz"
ls -lh "$OUTPUT_DIR/$FILENAME"
