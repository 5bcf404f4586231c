#!/bin/bash
# Copy queue9 artifacts (small JSON/PNG/log outputs, NOT checkpoints)
# from the /tmp/q9 snapshot back into the repo as legs land.
set -e
SRC=/tmp/q9/results
DST=/root/repo/results
for d in edm2_karras_natural32_30k ldm_natural32 ddpm_natural32 VAE/natural32_32_to_16; do
  [ -d "$SRC/$d" ] || continue
  (cd "$SRC/$d" && find . -type f \( -name '*.json' -o -name '*.png' \
      -o -name '*.txt' -o -name '*.jsonl' -o -name 'events.out.tfevents.*' \
    \) | while read -r f; do
      mkdir -p "$DST/$d/$(dirname "$f")"
      cp -p "$f" "$DST/$d/$f"
    done)
done
echo "collected"
