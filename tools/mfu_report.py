#!/usr/bin/env python
"""Roofline/MFU accounting for the hot env-step programs (VERDICT r3 weak
#8: env-steps/s alone can't say whether the solver runs at 5% or 50% of
peak).

For each workload: compile the pure step program, pull FLOP and HBM-byte
counts from XLA's cost analysis of the compiled executable, time the same
program, and report achieved FLOP/s and bytes/s against the chip's peaks —
i.e. which roof (compute or bandwidth) the program sits under and how far
below it.

Peaks (TPU v5e, public spec): 197 TFLOP/s bf16 MXU, ~1/2 that for f32
matmuls, 819 GB/s HBM. Physics here is f32 elementwise-dominated (VPU), so
the relevant compute roof is the VPU's ~4 TFLOP/s f32; the report prints
all three roofs and lets the numbers speak.

Usage: python tools/mfu_report.py [workload ...] (default: flat rough)
Writes artifacts/r05/MFU.md and prints the table.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

PEAKS = {
    "mxu_bf16_tflops": 197.0,
    "mxu_f32_tflops": 98.0,
    "vpu_f32_tflops": 4.0,  # 8x128 lanes * ~2 FLOP * ~940 MHz * 2 cores-ish
    "hbm_gbps": 819.0,
}


def _build(name, num_envs):
    if name == "flat":
        from isaaclab_tpu.envs import ManagerBasedRLEnv
        from isaaclab_tpu.tasks.manager_based.locomotion.velocity.config.anymal_c.flat_env_cfg import (
            AnymalCFlatEnvCfg,
        )

        cfg = AnymalCFlatEnvCfg()
        cfg.scene.num_envs = num_envs
        return ManagerBasedRLEnv(cfg)
    if name == "rough":
        from isaaclab_tpu.envs import ManagerBasedRLEnv
        from isaaclab_tpu.tasks.manager_based.locomotion.velocity.config.anymal_c.rough_env_cfg import (
            AnymalCRoughEnvCfg,
        )

        cfg = AnymalCRoughEnvCfg()
        cfg.scene.num_envs = num_envs
        return ManagerBasedRLEnv(cfg)
    if name == "shadow":
        import gymnasium as gym

        import isaaclab_tpu.tasks  # noqa: F401
        from isaaclab_tpu.tasks.utils import parse_env_cfg

        cfg = parse_env_cfg(
            "Isaac-Repose-Cube-Shadow-Direct-v0", num_envs=num_envs
        )
        return gym.make(
            "Isaac-Repose-Cube-Shadow-Direct-v0", cfg=cfg
        ).unwrapped
    raise SystemExit(f"unknown workload {name}")


DEFAULT_ENVS = {"flat": 8192, "rough": 4096, "shadow": 8192}


def analyze(name, num_envs, chunk=32, seconds=4.0):
    env = _build(name, num_envs)
    state = jax.jit(env.init_state)(jax.random.PRNGKey(0))
    act_dim = (
        env.action_manager.total_action_dim
        if hasattr(env, "action_manager")
        else env.num_actions
    )

    def run_chunk(s, key):
        # one batched RNG call for the chunk's actions (matches bench.py)
        actions = jax.random.uniform(
            key, (chunk, num_envs, act_dim), minval=-1.0, maxval=1.0
        )

        def body(carry, action):
            s2, _ = env.step_state(carry, action)
            return s2, None

        s, _ = jax.lax.scan(body, s, actions)
        return s

    lowered = jax.jit(run_chunk).lower(state, jax.random.PRNGKey(1))
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_ = float(ca.get("bytes accessed", 0.0))

    # time it (sync via scalar device_get — see bench.py)
    key = jax.random.PRNGKey(1)
    s = compiled(state, key)
    jax.device_get(jax.tree.leaves(s)[0].ravel()[0])
    n = 0
    t0 = time.perf_counter()
    while True:
        key, k = jax.random.split(key)
        s = compiled(s, k)
        n += 1
        if n % 2 == 0:
            jax.device_get(jax.tree.leaves(s)[0].ravel()[0])
            if time.perf_counter() - t0 > seconds:
                break
    jax.device_get(jax.tree.leaves(s)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / n  # seconds per chunk call
    fps = chunk * num_envs / dt
    achieved_tflops = flops / dt / 1e12
    achieved_gbps = bytes_ / dt / 1e9
    ai = flops / max(bytes_, 1.0)  # arithmetic intensity FLOP/byte
    return {
        "workload": name,
        "num_envs": num_envs,
        "env_steps_per_s": fps,
        "flops_per_chunk": flops,
        "bytes_per_chunk": bytes_,
        "arith_intensity": ai,
        "achieved_tflops": achieved_tflops,
        "achieved_hbm_gbps": achieved_gbps,
        "pct_hbm_roof": 100.0 * achieved_gbps / PEAKS["hbm_gbps"],
        "pct_vpu_roof": 100.0 * achieved_tflops / PEAKS["vpu_f32_tflops"],
        "pct_mxu_f32_roof": 100.0 * achieved_tflops / PEAKS["mxu_f32_tflops"],
    }


def main():
    names = sys.argv[1:] or ["flat", "rough"]
    rows = []
    for name in names:
        num_envs = int(
            os.environ.get(f"MFU_{name.upper()}_ENVS", DEFAULT_ENVS[name])
        )
        r = analyze(name, num_envs)
        rows.append(r)
        print(
            f"{name}@{num_envs}: {r['env_steps_per_s']:.0f} steps/s | "
            f"{r['achieved_tflops']:.3f} TFLOP/s "
            f"({r['pct_vpu_roof']:.1f}% VPU roof, "
            f"{r['pct_mxu_f32_roof']:.2f}% MXU-f32 roof) | "
            f"{r['achieved_hbm_gbps']:.1f} GB/s "
            f"({r['pct_hbm_roof']:.1f}% HBM roof) | "
            f"AI {r['arith_intensity']:.2f} FLOP/byte",
            flush=True,
        )
    os.makedirs("artifacts/r05", exist_ok=True)
    with open("artifacts/r05/MFU.md", "w") as f:
        f.write(
            "# Roofline / MFU report\n\n"
            "FLOP and HBM-byte counts from XLA cost analysis of the compiled "
            "step executable; times measured on the attached TPU (v5e). "
            f"Peaks assumed: {PEAKS}.\n\n"
            "| workload | envs | env-steps/s | TFLOP/s | %VPU | %MXU-f32 | "
            "GB/s | %HBM | FLOP/byte |\n|---|---|---|---|---|---|---|---|---|\n"
        )
        for r in rows:
            f.write(
                f"| {r['workload']} | {r['num_envs']} | "
                f"{r['env_steps_per_s']:.0f} | {r['achieved_tflops']:.3f} | "
                f"{r['pct_vpu_roof']:.1f} | {r['pct_mxu_f32_roof']:.2f} | "
                f"{r['achieved_hbm_gbps']:.1f} | {r['pct_hbm_roof']:.1f} | "
                f"{r['arith_intensity']:.2f} |\n"
            )
        f.write(
            "\nReading: a row near the HBM roof with low FLOP/byte is "
            "bandwidth-bound — the win is fusion/layout, not more FLOPs; "
            "a row far from every roof is latency/occupancy-bound "
            "(small per-step kernels, dispatch overhead).\n"
        )
    print("wrote artifacts/r05/MFU.md")


if __name__ == "__main__":
    main()
