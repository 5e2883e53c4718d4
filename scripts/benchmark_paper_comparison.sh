#!/usr/bin/env bash
#
# FQSqueezer-paper comparison rows (reference analog:
# scripts/benchmark-paper-comparison.sh; paper Table 1,
# https://www.nature.com/articles/s41598-020-57452-6).
#
# Runs our four configurations (v2 fqpack-class, v3 native, v3
# --max-ratio, --mesh) on the benchmark dataset, round-trip verified,
# and prints them next to the paper's ERR532393_1 rows. When the real
# dataset is absent (network blocked here), the input falls back to the
# system-source corpus like benchmark_canonical.sh — the paper rows are
# then printed for CONTEXT ONLY (clearly labeled: sizes on different
# inputs are not comparable).
#
# Usage: ./scripts/benchmark_paper_comparison.sh [input.fastq]
set -euo pipefail
SCRIPT_DIR="$(cd "$(dirname "$0")" && pwd)"
REPO_ROOT="$(cd "$SCRIPT_DIR/.." && pwd)"
cd "$REPO_ROOT"

INPUT="${1:-}"
LABEL="user-provided input"
if [[ -z "$INPUT" ]]; then
    LABEL="real ERR532393_1"
    if [[ -f "benchmark_data/ERR532393_1.fastq" ]]; then
        INPUT="benchmark_data/ERR532393_1.fastq"
    else
        INPUT="benchmark_data/system_source_1024mb.fastq"
        if [[ ! -f "$INPUT" ]]; then
            mkdir -p benchmark_data
            python scripts/make_system_corpus.py "$INPUT" 1024 >&2
        fi
        LABEL="system-source corpus (NOT the paper dataset; paper rows below are context only)"
    fi
fi
[[ -f "$INPUT" ]] || { echo "error: input not found: $INPUT" >&2; exit 1; }

FQ="python -m fastqpacker_tpu.cli.fqpack"
TMP="$(mktemp -d)"
trap 'rm -rf "$TMP"' EXIT
input_size=$(stat -c%s "$INPUT")

now_ms() { python -c 'import time; print(int(time.time()*1000))'; }

run_cfg() { # name, extra compress flags...
    local name="$1"; shift
    local t0 t1 t2 csize
    t0=$(now_ms)
    $FQ "$@" -i "$INPUT" -o "$TMP/out.fqz"
    t1=$(now_ms)
    csize=$(stat -c%s "$TMP/out.fqz")
    $FQ -d -i "$TMP/out.fqz" -o "$TMP/dec.fq"
    t2=$(now_ms)
    cmp "$INPUT" "$TMP/dec.fq" || { echo "round-trip FAILED: $name" >&2; exit 1; }
    rm -f "$TMP/out.fqz" "$TMP/dec.fq"
    printf "| %-22s | %6d MB | %5.2fx | %6.1fs | %6.1fs |\n" \
        "$name" $((csize / 1000000)) \
        "$(python -c "print($input_size/$csize)")" \
        "$(python -c "print(($t1-$t0)/1000)")" \
        "$(python -c "print(($t2-$t1)/1000)")"
}

echo "input: $INPUT ($input_size bytes; $LABEL)"
echo ""
echo "| Tool | Size | Ratio | Compress | Decompress |"
echo "|---|---|---|---|---|"
run_cfg "fqz-tpu (v2 class)"
run_cfg "fqz-tpu v3"            --format native
run_cfg "fqz-tpu v3 --max-ratio" --format native --max-ratio
run_cfg "fqz-tpu --mesh"        --format native --mesh
echo ""
echo "FQSqueezer paper Table 1, ERR532393_1 (9,011 MB input; real-data"
echo "rows from the paper/reference README — different hardware, and a"
echo "different input unless the real dataset was used above):"
echo "| FQSqueezer | 1,511 MB | 5.96x | ~hours | ~hours |"
echo "| DSRC 2     | 2,150 MB | 4.19x | 12s    | 18s    |"
echo "| fqpack     | 2,961 MB | 3.25x | 3.24s  | 2.95s  |"
echo "| zstd       | 3,312 MB | 2.72x | 11s    | 8s     |"
echo "| pigz       | 3,278 MB | 2.75x | 79s    | 12s    |"
