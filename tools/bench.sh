#!/usr/bin/env bash
# Bench / sf1-probe launcher with the two hygiene gates the perf record
# depends on (VERDICT r9 #8 and #3; PLANS.md "probe-batch hygiene"):
#
#   1. REFUSE to start while src/main is dirty — r9 invalidated 9 sf1
#      probe runs because a src/main edit landed mid-batch, making the
#      measured binary unattributable to any commit.
#   2. For ANCHOR runs (BENCH_ANCHOR=1), refuse unless 1-min loadavg
#      < 2.0 — the committed baseline must be a quiet-window number,
#      re-established at most once per round.
#
# Usage:
#   tools/bench.sh [query ...]            # full or subset bench run
#   SPARK_GRAFT_SF_DIR=... tools/bench.sh # other scale factors
#   BENCH_ANCHOR=1 tools/bench.sh         # loadavg-gated anchor run
set -euo pipefail
cd "$(dirname "$0")/.."

if ! git diff --quiet HEAD -- src/main build.sbt; then
  echo "bench.sh: REFUSING to run — src/main (or build.sbt) is dirty." >&2
  echo "Commit first so the measurement is attributable (PLANS.md rule)." >&2
  exit 1
fi

if [ "${BENCH_ANCHOR:-0}" = "1" ]; then
  load=$(cut -d' ' -f1 /proc/loadavg)
  if awk -v l="$load" 'BEGIN { exit !(l >= 2.0) }'; then
    echo "bench.sh: REFUSING anchor run — loadavg $load >= 2.0." >&2
    echo "An anchor must be a quiet-window number (VERDICT r9 #3)." >&2
    exit 1
  fi
  echo "bench.sh: anchor run, loadavg $load, HEAD $(git rev-parse --short HEAD)"
fi

exec sbt "runMain graft.Bench $*"
