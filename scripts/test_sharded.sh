#!/usr/bin/env bash
# Run the full pytest suite as N parallel deterministic shards.
#
#   scripts/test_sharded.sh [N]     (default N=8)
#
# Each shard is its own pytest process with its own 4-cpu Ray session
# (8 shards x 4 cpus = the 32-cpu box) and a 3 GiB object store cap so
# /dev/shm is never overcommitted.  Shard assignment is crc32(nodeid)
# (tests/conftest.py --shard), so every test runs in exactly one shard
# and the union over shards is byte-identical to a plain
# `python -m pytest tests/` collection.
#
# Exit code is non-zero if any shard fails; per-shard logs land in
# /tmp/wgr_test_shards/.
set -u
cd "$(dirname "$0")/.."
N="${1:-8}"
LOGDIR=/tmp/wgr_test_shards
mkdir -p "$LOGDIR"
run_shard() {
  # separate Ray temp dirs so n raylets never collide on one socket dir
  RAY_TMPDIR="/tmp/ray_shard_$1" TMPDIR="/tmp/ray_shard_$1" \
    python -m pytest tests/ -q --durations=10 --shard "$1/$N" \
    >"$LOGDIR/shard_$1.log" 2>&1
}
pids=()
for k in $(seq 1 "$N"); do
  run_shard "$k" &
  pids+=($!)
  sleep 2 # stagger ray.init port/socket grabs — concurrent local heads
          # racing the same ports have segfaulted raylets before
done
fail=0
for i in "${!pids[@]}"; do
  k=$((i + 1))
  if ! wait "${pids[$i]}"; then
    # one retry alone: a raylet startup crash under 8-way contention is
    # environmental, a code failure will fail identically solo
    echo "shard $k/$N failed; retrying solo..."
    if ! run_shard "$k"; then
      fail=1
      echo "shard $k/$N FAILED twice — tail of log:"
      tail -n 25 "$LOGDIR/shard_$k.log"
    fi
  fi
done
echo "--- shard summaries ---"
for k in $(seq 1 "$N"); do
  printf 'shard %2d: %s\n' "$k" "$(tail -n 1 "$LOGDIR/shard_$k.log")"
done
exit "$fail"
