#!/bin/bash
# Snapshot-launch for queue10: copy the code (sans .git / data / results)
# to /tmp/q10 so concurrent edits in /root/repo cannot break the run, but
# symlink BOTH data and results back into /root/repo — artifacts
# (milestone checkpoints, metrics.jsonl, rescore.json) are durable from
# the first write. No collection step needed afterwards.
set -ex
SRC=/root/repo
DST=/tmp/q10
rm -rf "$DST"
mkdir -p "$DST"
tar -C "$SRC" --exclude=.git --exclude=data --exclude=results \
    --exclude=__pycache__ --exclude=.pytest_cache -cf - . \
  | tar -C "$DST" -xf -
ln -sfn "$SRC/data" "$DST/data"
ln -sfn "$SRC/results" "$DST/results"
cd "$DST"
nohup bash scripts/run_measured_queue10.sh > /tmp/queue10.log 2>&1 &
echo $! > /tmp/queue10.pid
echo "queue10 launched: pid $(cat /tmp/queue10.pid), log /tmp/queue10.log"
