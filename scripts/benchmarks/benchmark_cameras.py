#!/usr/bin/env python
"""Camera-pipeline benchmark (reference benchmark_cameras.py): ray-caster
depth camera FPS on the depth cartpole task."""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))

parser = argparse.ArgumentParser()
parser.add_argument("--num_envs", type=int, default=1024)
parser.add_argument("--seconds", type=float, default=3.0)
args = parser.parse_args()


def main():
    import jax
    import jax.numpy as jnp

    from isaaclab_tpu.tasks.direct.cartpole.cartpole_camera_env import (
        CartpoleDepthCameraDirectEnv,
        CartpoleDepthCameraDirectEnvCfg,
    )

    cfg = CartpoleDepthCameraDirectEnvCfg()
    cfg.scene.num_envs = args.num_envs
    env = CartpoleDepthCameraDirectEnv(cfg)
    E = args.num_envs
    state = jax.jit(env.init_state)(jax.random.PRNGKey(0))

    @jax.jit
    def run_chunk(s):
        def body(c, _):
            c, _o = env.step_state(c, jnp.zeros((E, 1)))
            return c, None
        s, _ = jax.lax.scan(body, s, None, length=16)
        return s

    state = run_chunk(state)
    jax.device_get(state.scene.phys.q[0, 0])
    n, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < args.seconds:
        state = run_chunk(state)
        n += 1
        jax.device_get(state.scene.phys.q[0, 0])
    dt = time.perf_counter() - t0
    h = cfg.scene.depth_camera.pattern_cfg.height
    w = cfg.scene.depth_camera.pattern_cfg.width
    print(
        json.dumps(
            {
                "metric": "depth_camera_env_step_fps",
                "num_envs": E,
                "resolution": [h, w],
                "value": round(n * 16 * E / dt),
                "unit": "env-steps/s (1 depth image per env-step)",
            }
        )
    )


if __name__ == "__main__":
    main()
