#!/usr/bin/env bash
# Sharded core-tier runner (pytest-xdist is not in this container):
# round-robin the test FILES over N pytest processes, each on a
# smaller local[k] session, so the core tier's wall time divides by
# ~N on a 32-CPU host. File-level sharding keeps every module's
# session-scoped fixtures inside one process; the two files that
# touch the shared ./spark-warehouse catalog are pinned to shard 0.
#
# Usage: tools/run_core_tier.sh [n_shards]   (default 4)
# Exit code: 0 iff every shard is green. Per-shard logs:
# /tmp/core_shard_<i>.log
set -u
N=${1:-4}
cd "$(dirname "$0")/.."

n_files=$(ls tests/test_*.py | wc -l)
[ "$N" -gt "$n_files" ] && N=$n_files  # an empty shard would run ALL
[ "$N" -lt 1 ] && N=1                  # of tests/ (bare pytest call)

PINNED="tests/test_bucketing.py tests/test_etl_pipeline.py"
shard_files=()
for ((i = 0; i < N; i++)); do shard_files[i]=""; done
shard_files[0]="$PINNED"
j=0
for f in tests/test_*.py; do
    case " $PINNED " in *" $f "*) continue ;; esac
    shard_files[j]+=" $f"
    j=$(((j + 1) % N))
done

cpus=$(($(nproc) / N))  # host cores, not a hardcoded 32: on smaller
                        # machines local[32/N] would oversubscribe
[ "$cpus" -lt 2 ] && cpus=2
pids=()
for ((i = 0; i < N; i++)); do
    if [ -z "${shard_files[i]// /}" ]; then  # pinning can empty a
        pids[i]=""                           # shard at high N
        continue
    fi
    # shellcheck disable=SC2086 — word splitting is the point
    SPARK_GRAFT_CPUS=$cpus python -m pytest ${shard_files[i]} \
        -m "not slow" -q --no-header \
        >"/tmp/core_shard_$i.log" 2>&1 &
    pids[i]=$!
done

rc=0
for ((i = 0; i < N; i++)); do
    [ -z "${pids[i]}" ] && continue
    if ! wait "${pids[i]}"; then rc=1; fi
    echo "shard $i: $(tail -1 "/tmp/core_shard_$i.log")"
done
exit $rc
