#!/bin/bash
# Round-5: bounded repro of the round-4 IN-GRAPH replay InvalidArgument at
# K=400k, capturing the FULL error text (VERDICT r4 item 1 owes a paragraph
# on what the error actually was; the round-4 logs died with outputs/).
# 2 epochs max; the crash reproduced at the first epoch fetch in round 4.
set -u
set -o pipefail
cd "$(dirname "$0")/.."
mkdir -p outputs checkpoints/student_r5
OUT=outputs/repro_ingraph_400k
LOG=outputs/repro_ingraph_400k.log

CKPT="${TEACHER:-checkpoints/teacher_r2b/best_success.ckpt}" NUM_ENVS=256 \
  timeout "${REPRO_S:-2400}" bash scripts/train_s2.sh \
  dagger.replay_size=400000 dagger.replay_mode=in_graph \
  max_epochs=2 eval_freq_steps=1e18 output="$OUT" \
  > "$LOG" 2>&1
rc=$?
echo "repro rc=$rc (124 = timeout, e.g. compile-bound)"
# bank the tail with the actual error text for the post-mortem
tail -c 10000 "$LOG" > checkpoints/student_r5/repro_ingraph_invalidargument.txt
if [ -s "$OUT/metrics.jsonl" ]; then
  echo "SURVIVED: in-graph K=400k wrote metrics (no repro this time)"
else
  echo "crash/timeout reproduced; error tail:"
  tail -20 "$LOG"
fi
