#!/bin/bash
# Poll TPU-tunnel reachability; when it comes back, run the bench sweep.
# Used when the axon tunnel flaps mid-round (it went down for hours at
# the end of round 3). SIGTERM-bounded probes only — never kill -9 a
# TPU client (CLAUDE.md: it wedges the remote lease).
#
# Usage: bash scripts/tpu_watch.sh [stage...]   (stages forwarded to
#        run_bench_sweep.sh once the tunnel is up)
set -u
cd "$(dirname "$0")/.."
echo "tpu_watch: probing every 10 min until the tunnel answers"
while true; do
  if timeout 300 python - <<'EOF' >/dev/null 2>&1
import jax
assert jax.default_backend() != "cpu"
jax.devices()
EOF
  then
    echo "tpu_watch: TPU up at $(date)"
    break
  fi
  echo "tpu_watch: TPU down at $(date); retrying in 10 min"
  sleep 600
done
exec bash scripts/run_bench_sweep.sh "$@"
