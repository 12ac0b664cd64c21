#!/bin/bash
# Per-file test-suite runner.
#
# The round-5 machine sporadically segfaults inside XLA:CPU
# backend_compile_and_load partway through the MONOLITHIC pytest run
# (random position, hundreds of compiled executables accumulated in
# one process); every file passes in its own process.  This runner is
# the reliable green gate: one pytest process per test file, failing
# fast on real failures and aggregating the summary.
set -u
cd "$(dirname "$0")/.."
total_pass=0
fail=0
for f in tests/test_*.py; do
    out=$(timeout 1800 python -m pytest "$f" -q 2>&1 | tail -1)
    echo "$f: $out"
    case "$out" in
        *failed*|*error*) fail=1 ;;
        *passed*) n=${out%% passed*}; total_pass=$((total_pass + n)) ;;
        *) echo "  ^ no result line (crash/timeout?)"; fail=1 ;;
    esac
done
echo "TOTAL: $total_pass passed, fail_flag=$fail"
exit $fail
