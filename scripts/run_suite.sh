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
    # word-boundary matching: "N failed"/"N error(s)" are red, while
    # "N xfailed" / "N skipped" / "no tests ran" are green outcomes
    if echo "$out" | grep -qE '(^|[ ,])[0-9]+ (failed|errors?)\b'; then
        fail=1
    elif echo "$out" | grep -qE '[0-9]+ (passed|skipped|xfailed|xpassed|deselected)\b|no tests ran'; then
        n=$(echo "$out" | grep -oE '[0-9]+ passed' | grep -oE '[0-9]+')
        total_pass=$((total_pass + ${n:-0}))
    else
        echo "  ^ no result line (crash/timeout?)"; fail=1
    fi
done
echo "TOTAL: $total_pass passed, fail_flag=$fail"
exit $fail
