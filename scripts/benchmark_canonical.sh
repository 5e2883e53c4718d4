#!/usr/bin/env bash
#
# Canonical single-file benchmark: the disciplined README-row run
# (reference analog: scripts/benchmark_fqpack_9gb.sh — one verified
# round trip for size + correctness, then timed best-of-N runs).
#
# Usage:
#   ./scripts/benchmark_canonical.sh [input.fastq] [iterations]
#
# Input resolution order: $1, benchmark_data/ERR532393_1.fastq, else a
# generated real-shaped synthetic corpus (clearly labeled in the output;
# see download-benchmark-data.sh --synthetic).

set -euo pipefail
SCRIPT_DIR="$(cd "$(dirname "$0")" && pwd)"
REPO_ROOT="$(cd "$SCRIPT_DIR/.." && pwd)"
cd "$REPO_ROOT"

INPUT="${1:-}"
ITER="${2:-3}"
LABEL="real"
if [[ -z "$INPUT" ]]; then
    if [[ -f "benchmark_data/ERR532393_1.fastq" ]]; then
        INPUT="benchmark_data/ERR532393_1.fastq"
    elif [[ "${FQZ_CANONICAL_SYNTHETIC:-}" = "1" ]]; then
        echo "Generating a 1 GB synthetic genomic corpus" >&2
        ./scripts/download-benchmark-data.sh benchmark_data --synthetic 1024 >&2
        INPUT="benchmark_data/synthetic_genomic_1024mb.fastq"
        LABEL="synthetic-genomic (repo-generated; NOT comparable to published real-data rows)"
    else
        # offline default: content mapped from REAL system files, not
        # this repo's own generators (scripts/make_system_corpus.py)
        INPUT="benchmark_data/system_source_1024mb.fastq"
        if [[ ! -f "$INPUT" ]]; then
            mkdir -p benchmark_data
            echo "No real dataset found; building the system-source corpus" >&2
            python scripts/make_system_corpus.py "$INPUT" 1024 >&2
        fi
        # Corpora are regenerated on demand (not tracked in git); the
        # committed manifest pins the bytes the recorded rows ran on.
        # System-source content depends on the host's files, so a
        # mismatch is a warning (different machine), not an error.
        if [[ -f benchmark_data/MANIFEST.sha256 ]]; then
            if (cd "$REPO_ROOT" && grep "system_source_1024mb" benchmark_data/MANIFEST.sha256 | sha256sum -c --quiet -) 2>/dev/null; then
                echo "corpus matches committed manifest" >&2
            else
                echo "warning: corpus does not match benchmark_data/MANIFEST.sha256 (host-dependent content; rows are not directly comparable to recorded ones)" >&2
            fi
        fi
        LABEL="system-source mapping (real file content, repo-independent; NOT comparable to published real-data rows)"
    fi
fi
[[ -f "$INPUT" ]] || { echo "error: input not found: $INPUT" >&2; exit 1; }

# the native front-end (bin/fqpack, E077) is the product CLI for the
# v1/v2 path — ~5 ms startup vs ~2.3 s of Python/jax environment
# startup per invocation; it execs the Python CLI for v3/device runs
python fastqpacker_tpu/runtime/build.py --cli >/dev/null 2>&1 || true
if [[ -x bin/fqpack ]]; then
    FQ="bin/fqpack"
else
    FQ="python -m fastqpacker_tpu.cli.fqpack"
fi
TMP="$(mktemp -d)"
trap 'rm -rf "$TMP"' EXIT
OUT="$TMP/out.fqz"; DEC="$TMP/dec.fq"

input_size=$(stat -c%s "$INPUT")
echo "input: $INPUT ($input_size bytes, $LABEL)" >&2

# One verified run: size + byte-exact round trip (cmp, like the ref).
$FQ -i "$INPUT" -o "$OUT"
compressed_size=$(stat -c%s "$OUT")
$FQ -d -i "$OUT" -o "$DEC"
cmp "$INPUT" "$DEC" || { echo "error: round-trip verification failed" >&2; exit 1; }
echo "round trip verified (cmp)" >&2

now_ms() { python -c 'import time; print(int(time.time()*1000))'; }
best_ms() { # best-of-N wall time of "$@"
    local best=99999999 t0 t1 dt
    for _ in $(seq "$ITER"); do
        t0=$(now_ms); "$@" ; t1=$(now_ms)
        dt=$((t1 - t0)); [[ $dt -lt $best ]] && best=$dt
    done
    echo "$best"
}

compress_ms=$(best_ms $FQ -i "$INPUT" -o "$OUT")
decompress_ms=$(best_ms $FQ -d -i "$OUT" -o "$DEC")

awk -v in_sz="$input_size" -v out_sz="$compressed_size" \
    -v cms="$compress_ms" -v dms="$decompress_ms" -v label="$LABEL" 'BEGIN {
  ratio = in_sz / out_sz
  speed = (in_sz / 1e6) / (cms / 1000)
  printf "\nCompressed bytes: %d\nRatio: %.2fx\nCompress: %d ms\nDecompress: %d ms\nSpeed: %.1f MB/s\n\n", out_sz, ratio, cms, dms, speed
  printf "README row (%s):\n", label
  printf "| **fqz-tpu** | **%d MB** | **%.2fx** | **%.2fs** | **%.2fs** | **%.1f MB/s** |\n", out_sz/1000000, ratio, cms/1000, dms/1000, speed
}'

# v3 native ratio + timed rows on the same input (our format's
# headline; E080/E081 run BOTH directions as whole-file MT through the
# native front-end, so these rows carry no interpreter startup)
$FQ --format native -i "$INPUT" -o "$TMP/out3.fqz"
v3_size=$(stat -c%s "$TMP/out3.fqz")
$FQ -d -i "$TMP/out3.fqz" -o "$DEC"
cmp "$INPUT" "$DEC" || { echo "error: v3 round-trip failed" >&2; exit 1; }
v3_cms=$(best_ms $FQ --format native -i "$INPUT" -o "$TMP/out3.fqz")
v3_dms=$(best_ms $FQ -d -i "$TMP/out3.fqz" -o "$DEC")
awk -v in_sz="$input_size" -v v3="$v3_size" -v v2="$compressed_size" \
    -v cms="$v3_cms" -v dms="$v3_dms" 'BEGIN {
  printf "v3 native: %d MB (%.2fx; %.1f%% of the v2/fqpack-class size), %.2fs compress (%.1f MB/s) / %.2fs decompress (%.1f MB/s)\n", \
    v3/1000000, in_sz/v3, 100*v3/v2, cms/1000, (in_sz/1e6)/(cms/1000), dms/1000, (in_sz/1e6)/(dms/1000)
}'
