#!/bin/sh
# Run the test suite one file per process.
#
# Why: XLA:CPU AOT executable (de)serialization in the persistent compile
# cache segfaults flakily (~1/100 compiles; seen in both
# compilation_cache.get_executable_and_time and put_executable_and_time).
# A monolithic `pytest tests/` loses the whole run to one crash; per-file
# shards + one retry converge, and the persistent cache makes the retry
# warm.  Exit code 0 iff every file ends green.
set -u
cd "$(dirname "$0")/.."
fail=0
log=$(mktemp)
for f in tests/test_*.py; do
    for attempt in 1 2; do
        python -m pytest "$f" -x -q >"$log" 2>&1
        code=$?
        tail -2 "$log"
        [ $code -eq 0 ] && break
        echo "RETRY ($code) $f"
    done
    if [ $code -ne 0 ]; then
        echo "FAILED $f"
        fail=1
    fi
done
exit $fail
