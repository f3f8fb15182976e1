#!/bin/bash
# Wait until the axon TPU backend comes up, then launch phase-F teacher
# training (scripts/train_s1_anchor.sh). Used when the chip pool is
# contended: probes every 60 s, bounded by MAX_WAIT_S.
cd "$(dirname "$0")/.."
MAX_WAIT_S=${MAX_WAIT_S:-7200}
start=$(date +%s)
while true; do
  if timeout 300 python - <<'EOF'
import jax
d = jax.devices()
assert d and d[0].platform != "cpu", d
print("TPU up:", d)
EOF
  then
    break
  fi
  now=$(date +%s)
  if [ $((now - start)) -ge "$MAX_WAIT_S" ]; then
    echo "TPU never came up within ${MAX_WAIT_S}s" >&2
    exit 1
  fi
  sleep 60
done
exec bash scripts/train_s1_anchor.sh "$@"
