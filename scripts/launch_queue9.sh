#!/bin/bash
# Snapshot-launch for queue9: rsync the repo (sans .git / results bulk /
# the 200MB committed dataset, which is symlinked instead) to /tmp/q9 and
# run the queue there on the real TPU, so concurrent code edits in
# /root/repo cannot break a later leg mid-queue. Artifacts are copied
# back by scripts/collect_queue9.sh as legs land.
set -ex
SRC=/root/repo
DST=/tmp/q9
rm -rf "$DST"
mkdir -p "$DST"
tar -C "$SRC" --exclude=.git --exclude=data --exclude=results \
    --exclude=__pycache__ --exclude=.pytest_cache -cf - . \
  | tar -C "$DST" -xf -
ln -sfn "$SRC/data" "$DST/data"
mkdir -p "$DST/results"
cd "$DST"
nohup bash scripts/run_measured_queue9.sh > /tmp/queue9.log 2>&1 &
echo $! > /tmp/queue9.pid
echo "queue9 launched: pid $(cat /tmp/queue9.pid), log /tmp/queue9.log"
