#!/usr/bin/env python
"""Device-trace ONE PPO train iteration of a bench workload (the train
column was measured 70-100x below its rollout rate; this localizes where
the update spends its time).

Usage: python tools/trace_train.py <workload-name> [num_envs] [out_dir]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    import bench

    name = sys.argv[1]
    make_env, task_id, env_var, default_envs, _spc, _p = bench.WORKLOADS[name]
    num_envs = int(sys.argv[2]) if len(sys.argv) > 2 else int(
        os.environ.get(env_var, default_envs))
    out_dir = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/trace_train_{name}"

    env = make_env(num_envs)
    runner = bench._make_runner(env, task_id)
    ts = runner.init_train_state(seed=0)
    step = jax.jit(runner._train_iteration)

    def sync(s):
        jax.device_get(jax.tree.leaves(s)[0].ravel()[0])

    t0 = time.perf_counter()
    ts, _m = step(ts)
    sync(ts)
    print(f"compile+first iter: {time.perf_counter() - t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    ts, _m = step(ts)
    sync(ts)
    dt = time.perf_counter() - t0
    print(f"steady iter: {dt:.2f}s = "
          f"{runner.num_steps * num_envs / dt:,.0f} env-steps/s", flush=True)

    os.makedirs(out_dir, exist_ok=True)
    with jax.profiler.trace(out_dir):
        ts, _m = step(ts)
        sync(ts)
    print(f"trace written to {out_dir}", flush=True)
    import subprocess

    subprocess.run([sys.executable, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "xplane_summary.py"),
        out_dir, "30"])


if __name__ == "__main__":
    main()
