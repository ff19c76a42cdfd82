#!/usr/bin/env bash
# Concurrent test runner: the oracle suite (198 Spark-vs-DuckDB queries,
# the wall-clock dominator) fans out across $SHARDS pytest processes
# while the remaining test files split across two sibling processes
# (even/odd by position so the slow files spread).  Each process gets
# its own Spark session (SPARK_GRAFT_CPUS per process keeps the host
# subscribed ~evenly).  Exit code is non-zero if ANY shard fails.
#
#   ./scripts/test_fast.sh            # default 3 oracle shards + 2 rest
#   SHARDS=4 ./scripts/test_fast.sh
set -u
cd "$(dirname "$0")/.."
SHARDS="${SHARDS:-3}"
CPUS="${SPARK_GRAFT_CPUS:-8}"
mkdir -p /tmp/gpio_test_logs
pids=()
for ((k=0; k<SHARDS; k++)); do
  GPIO_ORACLE_SHARD="$k/$SHARDS" SPARK_GRAFT_CPUS="$CPUS" \
    python -m pytest tests/test_oracle_queries.py -q \
    > "/tmp/gpio_test_logs/oracle_$k.log" 2>&1 &
  pids+=($!)
done
# the streaming files are the slowest (real streaming queries,
# checkpoint restarts, the semantic-sink soak) — each gets its own
# process so they overlap the whole run instead of serializing a shard
SPARK_GRAFT_CPUS="$CPUS" python -m pytest tests/test_streaming.py -q \
  > /tmp/gpio_test_logs/rest_streaming.log 2>&1 &
pids+=($!)
SPARK_GRAFT_CPUS="$CPUS" python -m pytest tests/test_streaming_stateful.py -q \
  > /tmp/gpio_test_logs/rest_streaming_st.log 2>&1 &
pids+=($!)
mapfile -t files < <(ls tests/test_*.py \
  | grep -v -e test_oracle_queries -e 'test_streaming')
even=(); odd=()
for i in "${!files[@]}"; do
  if (( i % 2 == 0 )); then even+=("${files[$i]}"); else odd+=("${files[$i]}"); fi
done
SPARK_GRAFT_CPUS="$CPUS" python -m pytest "${even[@]}" -q \
  > /tmp/gpio_test_logs/rest_even.log 2>&1 &
pids+=($!)
SPARK_GRAFT_CPUS="$CPUS" python -m pytest "${odd[@]}" -q \
  > /tmp/gpio_test_logs/rest_odd.log 2>&1 &
pids+=($!)
rc=0
for p in "${pids[@]}"; do
  wait "$p" || rc=1
done
tail -n 2 /tmp/gpio_test_logs/*.log
exit $rc
