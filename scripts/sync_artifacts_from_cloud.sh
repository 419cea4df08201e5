#!/bin/sh
# Pull run artifacts from object storage (reference: sync_data_from_s3.sh).
# Usage: sync_artifacts_from_cloud.sh <bucket-url> [root]
set -eu
BUCKET="${1:?usage: sync_artifacts_from_cloud.sh <bucket-url> [root]}"
ROOT="${2:-.}"

sync_dir() {
    case "$BUCKET" in
        s3://*)  aws s3 sync --exact-timestamps "$BUCKET/$1" "$ROOT/$1" ;;
        gs://*)  gsutil -m rsync -r "$BUCKET/$1" "$ROOT/$1" ;;
        *) echo "unsupported bucket url: $BUCKET" >&2; exit 1 ;;
    esac
}

sync_dir example_images
sync_dir losses
sync_dir trained_model
sync_dir images
