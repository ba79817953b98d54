import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, "/root/repo")
t0 = time.time()
def mark(msg):
    print(f"[{time.time()-t0:8.1f}s] {msg}", flush=True)

import jax, jax.numpy as jnp
mark(f"jax up, devices={jax.devices()}")
import gymnasium as gym
import isaaclab_tpu.tasks  # noqa
from isaaclab_tpu.tasks.utils import parse_env_cfg
N = int(os.environ.get("N_ENVS", 8192))
cfg = parse_env_cfg("Isaac-Repose-Cube-Shadow-Direct-v0", num_envs=N)
env = gym.make("Isaac-Repose-Cube-Shadow-Direct-v0", cfg=cfg).unwrapped
mark(f"env built, N={N}")
state = jax.jit(env.init_state)(jax.random.PRNGKey(0))
jax.block_until_ready(jax.tree.leaves(state))
mark("init_state done")
act_dim = env.num_actions
@jax.jit
def run_chunk(s, key):
    def body(carry, k):
        action = jax.random.uniform(k, (N, act_dim), minval=-1.0, maxval=1.0)
        s2, _ = env.step_state(carry, action)
        return s2, None
    keys = jax.random.split(key, 32)
    s, _ = jax.lax.scan(body, s, keys)
    return s
tc = time.time()
lowered = run_chunk.lower(state, jax.random.PRNGKey(1))
mark(f"lowered (trace) in {time.time()-tc:.1f}s")
tc = time.time()
compiled = lowered.compile()
mark(f"compiled in {time.time()-tc:.1f}s")
s = compiled(state, jax.random.PRNGKey(1))
jax.block_until_ready(jax.tree.leaves(s))
mark("first chunk done")
tc = time.time()
n = 0
while time.time() - tc < 10.0:
    s = compiled(s, jax.random.PRNGKey(2+n))
    n += 1
    if n % 2 == 0:
        jax.block_until_ready(jax.tree.leaves(s))
jax.block_until_ready(jax.tree.leaves(s))
dt = time.time() - tc
mark(f"steady: {n} chunks in {dt:.2f}s -> {n*32*N/dt:,.0f} env-steps/s")
