#!/bin/sh
# Periodic artifact push loop — the reference's entire durability story
# (autosync_to_s3.sh:3-8: push every 600 s). Checkpoint/resume proper lives
# in the framework (train/checkpoint.py); this mirrors artifacts off-box.
# Usage: autosync_to_cloud.sh <bucket-url> [root] [interval-seconds]
set -eu
BUCKET="${1:?usage: autosync_to_cloud.sh <bucket-url> [root] [interval]}"
ROOT="${2:-.}"
INTERVAL="${3:-600}"
DIR="$(dirname "$0")"

while true; do
    "$DIR/sync_artifacts_to_cloud.sh" "$BUCKET" "$ROOT" || true
    sleep "$INTERVAL"
done
