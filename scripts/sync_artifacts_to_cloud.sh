#!/bin/sh
# Push run artifacts to object storage (reference: sync_data_to_s3.sh:3-6).
# Usage: sync_artifacts_to_cloud.sh <bucket-url> [root]
#   bucket-url: s3://bucket/prefix or gs://bucket/prefix
#   root:       directory holding the artifact trees (default .)
set -eu
BUCKET="${1:?usage: sync_artifacts_to_cloud.sh <bucket-url> [root]}"
ROOT="${2:-.}"

sync_dir() {
    [ -d "$ROOT/$1" ] || return 0
    case "$BUCKET" in
        s3://*)  aws s3 sync --exact-timestamps "$ROOT/$1" "$BUCKET/$1" ;;
        gs://*)  gsutil -m rsync -r "$ROOT/$1" "$BUCKET/$1" ;;
        *) echo "unsupported bucket url: $BUCKET" >&2; exit 1 ;;
    esac
}

sync_dir example_images
sync_dir losses
sync_dir trained_model
sync_dir images
