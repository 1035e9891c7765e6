#!/usr/bin/env bash
# Start the geometry wrapper service (merged geometry + websocket + snapshots).
set -euo pipefail
cd "$(dirname "$0")"
GEOMETRY="${1:-geometry-divB.yml}"
exec python -m wrapper_backend --geometry "$GEOMETRY"
