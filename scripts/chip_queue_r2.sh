#!/bin/bash
# Round-2 chip job queue: once the axon TPU comes up, (1) run the north-star
# sensors-on bench and save its JSON, then (2) start phase-F teacher
# fine-tuning (scripts/train_s1_anchor.sh). Serializes chip use so the bench
# isn't contended by training.
cd "$(dirname "$0")/.."
MAX_WAIT_S=${MAX_WAIT_S:-14400}
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
echo "=== bench (sensors-on north star) ==="
timeout 2400 python bench.py | tee /tmp/bench_r2_northstar.json
echo "=== phase F teacher ==="
exec bash scripts/train_s1_anchor.sh "$@"
