"""Summarize post-peak collapse telemetry from a training run's metrics.jsonl.

Round-2 verdict: every teacher phase collapses past its success peak; the
anneal ladder + anchor-KL bound the damage but nobody diagnosed the cause.
algo/ppo.py now logs diag/* every epoch (value-error and advantage
decomposed by inserted-vs-not states, entropy, clip fraction). This tool
locates the success peak in a run and prints how each diag series moves
from pre-peak -> peak -> post-peak, which is the evidence the diagnosis
needs (reference meter context: frozen_ppo.py:279-281 only tracked FPS and
episode rewards — it could not see this).

Usage: python tools/collapse_report.py outputs/<run>/metrics.jsonl [window]
"""

import json
import sys


def load(path):
    rows = []
    with open(path) as f:
        for line in f:
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    return [r for r in rows if "episode/success" in r]


def window_mean(rows, keys, lo, hi):
    out = {}
    sel = rows[lo:hi]
    for k in keys:
        vals = [r[k] for r in sel if k in r and r[k] == r[k]]  # drop NaN
        out[k] = sum(vals) / len(vals) if vals else float("nan")
    return out


def main():
    path = sys.argv[1]
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    rows = load(path)
    if len(rows) < 3 * w:
        print(f"only {len(rows)} epochs logged; need >= {3 * w} for windows")
        w = max(len(rows) // 3, 1)

    succ = [r["episode/success"] for r in rows]
    # smoothed peak: best w-epoch window mean
    best_i, best_v = 0, -1.0
    for i in range(0, len(succ) - w):
        m = sum(succ[i:i + w]) / w
        if m > best_v:
            best_i, best_v = i, m
    peak = best_i + w // 2

    keys = sorted({k for r in rows for k in r if k.startswith("diag/")})
    keys = ["episode/success", "episode/reward", "kl", "loss"] + keys
    pre = window_mean(rows, keys, max(peak - 2 * w, 0), max(peak - w, 1))
    atp = window_mean(rows, keys, max(peak - w // 2, 0), peak + w // 2)
    post_lo = min(peak + w, len(rows) - w)
    post = window_mean(rows, keys, post_lo, post_lo + w)
    tail = window_mean(rows, keys, len(rows) - w, len(rows))

    print(f"run: {path}  epochs: {len(rows)}  peak window mean success: "
          f"{best_v:.4f} @ epoch index {peak}")
    print(f"{'metric':32s} {'pre-peak':>12s} {'peak':>12s} "
          f"{'post-peak':>12s} {'tail':>12s}")
    for k in keys:
        print(f"{k:32s} {pre[k]:12.5f} {atp[k]:12.5f} "
              f"{post[k]:12.5f} {tail[k]:12.5f}")


if __name__ == "__main__":
    main()
