"""Benchmark: fused PPO train-epoch throughput at the north-star config.

Primary metric (BASELINE.json north star): env-steps/sec/chip of the FULL
fused PPO train epoch — physics + DR + resets + sensors (tactile 3×64×64 and
96×54 depth+seg cameras ON) + rollout + GAE + minibatch updates in one jit
graph — at 8192 envs. `vs_baseline` divides by the driver's ASSUMED 10k A100
IsaacGym reference point (target ≥ 5.0); the divisor is a pin, not a number
measured from the reference repo (which publishes none — BASELINE.md).

Fail-fast design (round-2 postmortem: a dead TPU backend hung bench.py into
the driver's rc=124 and the round recorded nothing): every measurement runs
in a bounded subprocess (`--worker`), so a wedged backend init or compile
costs one phase's timeout and the orchestrator still prints a complete JSON
line with an explicit "error" field for whatever failed.

Un-losable design (round-4 postmortem: the orchestrator ITSELF was killed at
the driver's wall-clock cap before its single final print, erasing even the
previously-measured sensors-on number — BENCH_r04.json rc=124, tail empty):
  - after EVERY phase the current combined JSON is printed (flushed) AND
    written to BENCH_partial.json, so a kill at any point leaves the last
    complete snapshot as the stdout tail;
  - a total-runtime budget (IGT_BENCH_TOTAL_BUDGET, default 2100 s) skips
    remaining phases — with an explicit note — instead of dying mid-phase;
  - phases run most-important-first (sensors-on headline, then pcl, then
    state-only) so whatever lands first is the number that matters most;
  - compiles go through the persistent cache (/root/repo/.jax_cache), so a
    warm-up run earlier in the round makes the final run compile-free.

MFU is estimated from XLA cost analysis over the *actual* chip's bf16 peak,
keyed on jax.devices()[0].device_kind (the physics path runs f32 under
ops.f32_matmul, so this is a conservative utilization bound).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ASSUMED_A100_BASELINE = 10_000.0  # env-steps/sec, IsaacGym factory insertion (assumed pin)

# bf16 peak FLOPs/s per chip, keyed by jax device_kind substrings.
PEAK_FLOPS_BY_KIND = [
    ("v6", 918e12),       # Trillium / v6e
    ("v5p", 459e12),
    ("v5 lite", 197e12),  # v5e reports device_kind "TPU v5 lite"
    ("v5e", 197e12),
    ("v5", 459e12),       # bare "TPU v5" -> assume v5p
    ("v4", 275e12),
]
DEFAULT_PEAK = 197e12

# first compile of the fused epoch through the axon tunnel takes ~15 min;
# bound each measurement well above that but still finite (fail-fast goal)
WORKER_TIMEOUT_S = int(os.environ.get("IGT_BENCH_TIMEOUT", "2700"))


def peak_flops(device_kind: str) -> float:
    dk = device_kind.lower()
    for key, peak in PEAK_FLOPS_BY_KIND:
        if key in dk:
            return peak
    return DEFAULT_PEAK


# --------------------------------------------------------------------------
# worker: one measurement in one process (bounded by the orchestrator)
# --------------------------------------------------------------------------

def build_epoch(cfg, n_envs, horizon=64):
    import jax

    from isaacgyminsertion_tpu.algo import ppo as ppo_mod
    from isaacgyminsertion_tpu.assets import build_subassembly_set
    from isaacgyminsertion_tpu.physics.robot import build_kuka_openhand

    model = build_kuka_openhand()
    subs = build_subassembly_set()
    ppo_cfg = ppo_mod.PPOConfig(horizon=horizon)
    net, tx, state, train_epoch = ppo_mod.build(
        cfg, ppo_cfg, model, subs, n_envs, jax.random.PRNGKey(0)
    )
    return jax.jit(train_epoch), state, ppo_cfg


def measure(step, state, n_envs, horizon, epochs=3):
    import jax

    lowered = step.lower(state)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    flops = float(cost.get("flops", 0.0)) if cost else 0.0

    state, metrics = step(state)   # warmup (already compiled)
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    for _ in range(epochs):
        state, metrics = step(state)
    jax.block_until_ready(metrics)
    dt = (time.perf_counter() - t0) / epochs
    rate = horizon * n_envs / dt
    device_kind = jax.devices()[0].device_kind
    mfu = flops / dt / peak_flops(device_kind) if flops else 0.0
    return rate, mfu, device_kind


def worker(mode: str, n_envs: int, horizon: int) -> None:
    """Run one measurement; print one JSON line; exit 0 on success."""
    import dataclasses

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from isaacgyminsertion_tpu.envs.config import default_task_config

    base = default_task_config()
    if mode == "sensors":
        # render_capacity=0.75: render-on-demand gathers only the env rows
        # that consume a fresh frame this step (expected consume fraction
        # 0.675 with max_skip=2 + delay 0.1); what the policy observes is
        # unchanged up to the vanishing binomial tail, so this is the honest
        # sensors-on number.
        cfg = base.replace(env=dataclasses.replace(
            base.env, tactile=True, external_cam=True, depth_cam=True,
            seg_cam=True, render_capacity=0.75))
    elif mode == "pcl":
        # full visuotactile: tactile + depth/seg + POINT CLOUD generation
        # (BASELINE.json config #5; VERDICT r3 "sensors-on excludes the
        # point cloud" — measured separately here)
        cfg = base.replace(env=dataclasses.replace(
            base.env, tactile=True, external_cam=True, depth_cam=True,
            seg_cam=True, pcl_cam=True, render_capacity=0.75))
    else:
        cfg = base
    step, state, ppo_cfg = build_epoch(cfg, n_envs, horizon)
    rate, mfu, device_kind = measure(step, state, n_envs, ppo_cfg.horizon)
    print(json.dumps({"rate": rate, "mfu": mfu, "device_kind": device_kind}))


def run_worker(mode: str, n_envs: int, horizon: int, timeout: int):
    """Bounded subprocess around one measurement. Returns (dict|None, err|None)."""
    cmd = [sys.executable, os.path.abspath(__file__),
           "--worker", mode, str(n_envs), str(horizon)]
    try:
        out = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout,
            cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired:
        return None, f"{mode}@{n_envs}: timeout after {timeout}s"
    if out.returncode != 0:
        tail = (out.stderr or out.stdout or "").strip().splitlines()[-3:]
        return None, f"{mode}@{n_envs}: rc={out.returncode}: " + " | ".join(tail)[-400:]
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return json.loads(line), None
        except json.JSONDecodeError:
            continue
    return None, f"{mode}@{n_envs}: no JSON in worker output"


# --------------------------------------------------------------------------
# orchestrator
# --------------------------------------------------------------------------

TOTAL_BUDGET_S = int(os.environ.get("IGT_BENCH_TOTAL_BUDGET", "2100"))
PARTIAL_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_partial.json")


def main(n_ns=8192, n_so=1024, horizon=64):
    t_start = time.perf_counter()
    errors = []
    results = {"sensors": None, "pcl": None, "state": None}
    n_used = n_ns

    def emit(final=False):
        """Print + persist the current combined snapshot (never lose a
        landed phase). The stdout tail is always the latest complete JSON."""
        ns, pc, so = results["sensors"], results["pcl"], results["state"]
        rate_ns = ns["rate"] if ns else None
        out = {
            "metric": f"ppo_env_steps_per_sec_sensors_on_{n_used}",
            "value": round(rate_ns, 1) if rate_ns is not None else None,
            "unit": "env-steps/s",
            "vs_baseline": round(rate_ns / ASSUMED_A100_BASELINE, 3) if rate_ns is not None else None,
            "vs_baseline_note": "divisor is the driver's assumed 10k A100 env-steps/s pin (reference publishes no numbers)",
            f"state_only_{n_so}": round(so["rate"], 1) if so else None,
            f"full_visuotactile_pcl_{n_used}": round(pc["rate"], 1) if pc else None,
            "mfu_estimate": round(ns["mfu"], 4) if ns else 0.0,
            "device_kind": next((r["device_kind"] for r in (ns, pc, so) if r), "unknown"),
            "config": f"{n_used} envs, tactile 3x64x64 + depth/seg 96x54, "
                      f"render_capacity 0.75, horizon {horizon}",
            "elapsed_s": round(time.perf_counter() - t_start, 1),
        }
        if not final:
            out["partial"] = True
        if errors:
            out["error"] = "; ".join(e for e in errors if e)
        line = json.dumps(out)
        print(line, flush=True)
        try:
            with open(PARTIAL_PATH, "w") as f:
                f.write(line + "\n")
        except OSError:
            pass
        return out

    def budget_left():
        return TOTAL_BUDGET_S - (time.perf_counter() - t_start)

    def bounded(mode, n, min_need=240):
        """Run one phase inside the remaining total budget (skip, don't die)."""
        left = budget_left()
        if left < min_need:
            err = f"{mode}@{n}: skipped (total budget: {left:.0f}s left)"
            errors.append(err)
            print(f"bench: {err}", file=sys.stderr)
            return None
        res, err = run_worker(mode, n, horizon, int(min(WORKER_TIMEOUT_S, left)))
        if res is None:
            errors.append(err)
            print(f"bench: {err}", file=sys.stderr)
        return res

    # north star first (the headline number): 8192 envs, tactile + depth/seg
    # cameras on. If the chip can't take the full batch, degrade to the
    # largest sensors-on batch that runs rather than reporting nothing.
    for n_try in (n_ns, n_ns // 2, n_ns // 4):
        res = bounded("sensors", n_try)
        if res is not None:
            results["sensors"] = res
            n_used = n_try
            break
    emit()

    # full-visuotactile config #5 (tactile + depth/seg + pcl) at the same
    # batch the sensors-on number landed at
    results["pcl"] = bounded("pcl", n_used)
    emit()

    results["state"] = bounded("state", n_so)
    emit(final=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
    else:
        main(*[int(a) for a in sys.argv[1:4]])
