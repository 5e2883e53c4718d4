#!/usr/bin/env bash
# Multi-tool comparison benchmark with mandatory round-trip verification
# (reference analog: scripts/benchmark.sh — compare vs gzip/pigz/zstd with
# diff/cmp verify before reporting).
#
# Usage: scripts/benchmark.sh [input.fq]
# Without an input file, generates synthetic Illumina-style data.
set -euo pipefail

cd "$(dirname "$0")/.."
PY=${PY:-python}
INPUT=${1:-}
WORK=$(mktemp -d)
trap 'rm -rf "$WORK"' EXIT

if [ -z "$INPUT" ]; then
    echo "generating 256 MB synthetic FASTQ..."
    $PY - <<EOF
from fastqpacker_tpu.utils import malloc_tuning
malloc_tuning.tune(); malloc_tuning.warm_heap(1024 << 20)
from bench import synth_fastq
open("$WORK/bench.fq", "wb").write(synth_fastq(256))
EOF
    INPUT="$WORK/bench.fq"
fi

SIZE=$(stat -c %s "$INPUT")
echo "input: $INPUT ($SIZE bytes)"
echo

run_tool() {
    local name="$1" comp_cmd="$2" decomp_cmd="$3" out="$4" back="$5"
    local t0 t1 t2
    t0=$(date +%s.%N)
    eval "$comp_cmd"
    t1=$(date +%s.%N)
    eval "$decomp_cmd"
    t2=$(date +%s.%N)
    if ! cmp -s "$INPUT" "$back"; then
        # fqz normalizes lowercase/exotic bases; synthetic data has none,
        # so any mismatch is a real failure.
        echo "$name: ROUND-TRIP FAILED" >&2
        return 1
    fi
    local csize
    csize=$(stat -c %s "$out")
    # awk, not bc: bc is not installed on minimal hosts
    awk -v n="$name" -v sz="$SIZE" -v cs="$csize" \
        -v t0="$t0" -v t1="$t1" -v t2="$t2" 'BEGIN {
        ct = t1 - t0; dt = t2 - t1;
        printf "%-12s %12d bytes  %6.2fx  compress %6.2fs (%7.1f MB/s)  decompress %6.2fs\n", \
            n, cs, sz / cs, ct, sz / ct / 1000000, dt }'

}

export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
FQ="$PY -m fastqpacker_tpu.cli.fqpack"

# Interpreter + JAX import cost is paid INSIDE each timed CLI run (the
# reference binary starts in ms; this CLI in seconds) — print it so the
# per-tool times can be read net of startup. Disk writeback on minimal
# hosts (~60 MB/s) also bounds decompress-to-file at this size.
printf '@r\nACGT\n+\nIIII\n' > "$WORK/tiny.fq"
b0=$(date +%s.%N)
$FQ -i "$WORK/tiny.fq" -o "$WORK/tiny.fqz"
b1=$(date +%s.%N)
awk -v a="$b0" -v b="$b1" 'BEGIN {
    printf "CLI startup baseline (included in every timing): %.2fs\n\n", b - a }'


run_tool "fqpack-tpu" \
    "$FQ -i '$INPUT' -o '$WORK/a.fqz'" \
    "$FQ -d -i '$WORK/a.fqz' -o '$WORK/a.fq'" \
    "$WORK/a.fqz" "$WORK/a.fq"

run_tool "fqz-native" \
    "$FQ --format native -i '$INPUT' -o '$WORK/n.fqz'" \
    "$FQ -d -i '$WORK/n.fqz' -o '$WORK/n.fq'" \
    "$WORK/n.fqz" "$WORK/n.fq"

if command -v gzip >/dev/null; then
    run_tool "gzip" \
        "gzip -c '$INPUT' > '$WORK/g.gz'" \
        "gzip -dc '$WORK/g.gz' > '$WORK/g.fq'" \
        "$WORK/g.gz" "$WORK/g.fq"
fi
if command -v zstd >/dev/null; then
    run_tool "zstd" \
        "zstd -q -f '$INPUT' -o '$WORK/z.zst'" \
        "zstd -q -d -f '$WORK/z.zst' -o '$WORK/z.fq'" \
        "$WORK/z.zst" "$WORK/z.fq"
fi
