"""Shadow step probe with max_active_contacts overridden (the K A/B the
r4 verdict asked for). Usage: python probe_shadow_k.py <K> [num_envs]."""
import os, sys, time
sys.path.insert(0, "/root/repo")
t0 = time.time()
def mark(m):
    print(f"[{time.time()-t0:8.1f}s] {m}", flush=True)

import jax, jax.numpy as jnp
import gymnasium as gym
import isaaclab_tpu.tasks  # noqa
from isaaclab_tpu.tasks.utils import parse_env_cfg

K = int(sys.argv[1])
N = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
cfg = parse_env_cfg("Isaac-Repose-Cube-Shadow-Direct-v0", num_envs=N)
cfg.sim.max_active_contacts = K
env = gym.make("Isaac-Repose-Cube-Shadow-Direct-v0", cfg=cfg).unwrapped
mark(f"env built N={N} K={K}")
state = jax.jit(env.init_state)(jax.random.PRNGKey(0))
jax.device_get(jax.tree.leaves(state)[0].ravel()[0])
A = env.num_actions
def run_chunk(s, key):
    actions = jax.random.uniform(key, (32, N, A), minval=-1., maxval=1.)
    def body(c, a):
        s2, _ = env.step_state(c, a)
        return s2, None
    s, _ = jax.lax.scan(body, s, actions)
    return s
tc = time.time()
compiled = jax.jit(run_chunk).lower(state, jax.random.PRNGKey(1)).compile()
mark(f"compiled in {time.time()-tc:.1f}s")
def sync(s):
    jax.device_get(jax.tree.leaves(s)[0].ravel()[0])
s = compiled(state, jax.random.PRNGKey(1)); sync(s)
key = jax.random.PRNGKey(2); n = 0; tc = time.time()
while time.time() - tc < 8.0:
    key, k = jax.random.split(key)
    s = compiled(s, k); n += 1
    if n % 4 == 0: sync(s)
sync(s)
dt = time.time() - tc
mark(f"STEADY K={K}: {n*32*N/dt:,.0f} env-steps/s")
