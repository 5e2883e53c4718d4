#!/usr/bin/env bash
# Two-way interop against the REAL Go fqpack binary (VERDICT r1 missing #1).
#
# Usage: scripts/interop_go.sh [path-to-go-reference-repo]
# Needs: go toolchain; the reference sources (default: $FQPACK_REF,
# /root/reference, or a fresh clone of github.com/vertti/fastqpacker).
#
# Direction 1: our writer -> go binary -d   (Go must accept our v2)
# Direction 2: go binary  -> our -d         (we must accept Go's v2)
set -euo pipefail
cd "$(dirname "$0")/.."

REF="${1:-${FQPACK_REF:-/root/reference}}"
if ! command -v go >/dev/null; then
  # Exit 3 = SKIPPED, distinct from PASS (0) and FAIL (1/2): a CI job
  # must not go green on a missing toolchain (VERDICT r3 weak #6).
  echo "SKIP: go toolchain not available (exit 3 = skipped, not passed)" >&2
  exit 3
fi
if [ ! -f "$REF/go.mod" ]; then
  echo "reference not found at $REF; trying to clone..." >&2
  REF=$(mktemp -d)/fastqpacker
  git clone --depth 1 https://github.com/vertti/fastqpacker "$REF"
fi

BIN=$(mktemp -d)/fqpack
(cd "$REF" && go build -o "$BIN" ./cmd/fqpack)
echo "built reference binary: $BIN" >&2

WORK=$(mktemp -d)
trap 'rm -rf "$WORK"' EXIT
python - "$WORK/in.fq" <<'EOF'
import sys
import numpy as np
rng = np.random.default_rng(7)
recs = []
for i in range(50000):
    ln = int(rng.integers(1, 200))
    s = "".join("ACGTN"[b] for b in rng.integers(0, 5, ln))
    q = "".join(chr(33 + int(b)) for b in rng.integers(0, 42, ln))
    plus = f"+x{i}" if i % 3 == 0 else "+"
    recs.append(f"@sr{i} f:{i%11}\n{s}\n{plus}\n{q}\n")
open(sys.argv[1], "w").write("".join(recs))
EOF

echo "== ours -> go -d ==" >&2
python -m fastqpacker_tpu.cli.fqpack -i "$WORK/in.fq" -o "$WORK/ours.fqz"
"$BIN" -d -i "$WORK/ours.fqz" -o "$WORK/go_decoded.fq"
cmp "$WORK/in.fq" "$WORK/go_decoded.fq"
echo "OK: the Go binary decodes our v2 byte-identically" >&2

echo "== go -> ours -d ==" >&2
"$BIN" -i "$WORK/in.fq" -o "$WORK/go.fqz"
python -m fastqpacker_tpu.cli.fqpack -d -i "$WORK/go.fqz" -o "$WORK/our_decoded.fq"
cmp "$WORK/in.fq" "$WORK/our_decoded.fq"
echo "OK: we decode the Go binary's v2 byte-identically" >&2

echo "== fqscramble PCG byte-parity ==" >&2
BIN_SCRAMBLE=$(dirname "$BIN")/fqscramble
(cd "$REF" && go build -o "$BIN_SCRAMBLE" ./cmd/fqscramble)
"$BIN_SCRAMBLE" -seed 42 -i "$WORK/in.fq" -o "$WORK/go_scrambled.fq"
python -m fastqpacker_tpu.cli.fqscramble -seed 42 -i "$WORK/in.fq" \
  -o "$WORK/our_scrambled.fq"
cmp "$WORK/go_scrambled.fq" "$WORK/our_scrambled.fq"
echo "OK: fqscramble output is byte-identical to the Go tool" >&2

echo "== capture go-binary fixture for tests/testdata ==" >&2
head -c 40000 "$WORK/in.fq" > "$WORK/fix_raw"
python - "$WORK/fix_raw" "$WORK/fixture_in.fq" <<'EOF'
import sys
raw = open(sys.argv[1], "rb").read()
# cut at the last complete 4-line record
lines = raw.split(b"\n")
keep = (len(lines) - 1) // 4 * 4
open(sys.argv[2], "wb").write(b"\n".join(lines[:keep]) + b"\n")
EOF
"$BIN" -b 100 -i "$WORK/fixture_in.fq" -o "$WORK/go_fixture.fqz"
FIX_DIR="${FIXTURE_OUT:-$WORK}"
mkdir -p "$FIX_DIR"
cp "$WORK/go_fixture.fqz" "$FIX_DIR/go_fixture.fqz"
cp "$WORK/fixture_in.fq" "$FIX_DIR/go_fixture_in.fq"
echo "fixture at $FIX_DIR/go_fixture.fqz (set FIXTURE_OUT to collect;" >&2
echo "commit as tests/testdata/golden/go_fixture.fqz + go_fixture_in.fq;" >&2
echo "tests/test_go_interop.py consumes it automatically when present)" >&2

echo "INTEROP PASS" >&2
