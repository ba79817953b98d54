#!/usr/bin/env python
"""Benchmark driver entry — mirrors the reference's 3-column KPI tables
(performance_benchmarks.rst: pure env stepping / + policy inference /
+ training) plus device memory, per workload.

Design constraints (learned the hard way in round 4, where the driver's
wall clamp produced ZERO rows):

* **Cheap rows print FIRST** (cartpole, then flat), expensive contact
  workloads after — a timeout loses the tail, not everything.
* **Incremental emission**: every measured column is flushed immediately
  as its own JSON line. A workload emits its step-only row the moment the
  step column lands, then re-emits the row enriched with infer/train
  columns. The driver tail-parses the LAST JSON line; the judge reads all
  of them — duplicate metrics supersede by position.
* **Global deadline** (`BENCH_GLOBAL_DEADLINE`, default 2100 s): the
  parent degrades remaining workloads to step-only, then skips them,
  rather than letting one cold compile eat the budget.
* **Streaming subprocesses**: each workload runs in its own Python
  process (a TPU-worker crash costs one row) and the parent relays child
  stdout line-by-line, so rows printed before a kill survive it.
* **Persistent compile cache** in-repo (`.jax_cache/`): in-session runs
  pre-warm the driver's end-of-round run on the same filesystem.

Workloads vs reference 1x RTX 4090 triplets (step / +inference / +train):

  cartpole_env_step_fps_4096envs_1chip        vs 1.10M / 0.91M / 0.51M (rst:57)
  anymal_flat_env_step_fps_8192envs_1chip     vs 5M north star (BASELINE.json)
  anymal_rough_env_step_fps_4096envs_1chip    vs  94k /  88k /  82k (rst:61)
  shadow_repose_env_step_fps_8192envs_1chip   vs 200k / 190k / 170k (rst:63)
  cartpole_camera_env_step_fps_1024envs_1chip vs  50k /  45k /  32k (rst:59)

Actions for the step column are random (fixed PRNG) — zero actions leave
contact-heavy workloads standing still and understate solver cost vs the
reference's random-action benchmark (scripts/benchmarks/benchmark_non_rl.py).

Env knobs: BENCH_HEADLINE_ONLY=1 (cartpole only), BENCH_STEP_ONLY=1 (skip
inference/train columns), BENCH_GLOBAL_DEADLINE, BENCH_WORKLOAD_TIMEOUT,
BENCH_{NUM,FLAT,ROUGH,SHADOW,CAMERA}_ENVS.
"""

import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
# persistent compile cache: repeated bench runs skip the (slow) remote compile
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# reference 1x RTX 4090 FPS triplets (step, +inference, +train), BASELINE.md
BASELINES = {
    "cartpole_env_step_fps_4096envs_1chip": (1_100_000.0, 910_000.0, 510_000.0),
    "cartpole_camera_env_step_fps_1024envs_1chip": (50_000.0, 45_000.0, 32_000.0),
    "anymal_rough_env_step_fps_4096envs_1chip": (94_000.0, 88_000.0, 82_000.0),
    "shadow_repose_env_step_fps_8192envs_1chip": (200_000.0, 190_000.0, 170_000.0),
    # BASELINE.json north star: 5M env-steps/s @ 8192 envs/chip on
    # Anymal-velocity (no reference 3-column row exists at this size)
    "anymal_flat_env_step_fps_8192envs_1chip": (5_000_000.0, None, None),
}
# Per-workload subprocess wall clamp (compile can take minutes cold; the
# shadow step alone compiles ~20-30 min on the axon backend).
WORKLOAD_TIMEOUT_S = float(os.environ.get("BENCH_WORKLOAD_TIMEOUT", 2400))
# Whole-bench wall clamp. Deliberately LARGER than any plausible driver
# budget: rows STREAM to stdout as they are measured, so the driver's own
# timeout is the binding constraint and every already-printed row
# survives it — our own deadline only bounds a driverless local run.
GLOBAL_DEADLINE_S = float(os.environ.get("BENCH_GLOBAL_DEADLINE", 9000))
# Below this remaining budget a workload runs step-only; below the skip
# threshold it is not attempted at all.
STEP_ONLY_THRESHOLD_S = 420.0
SKIP_THRESHOLD_S = 150.0


def _sync(x):
    import jax

    # both: block on every output buffer AND force one round trip — over
    # the axon tunnel either alone can return before queued work completes
    jax.block_until_ready(jax.tree.leaves(x))
    jax.device_get(jax.tree.leaves(x)[0].ravel()[0])


def _time_loop(run, carry, steps_per_call, num_envs, seconds, *, with_key=False):
    """Time carry -> carry chunks; returns env-steps/s.

    TWO fully-synced warmup calls: on the axon backend the first two
    executions of a large program each take ~15-20 s (server-side
    finalization) before settling — measured cartpole train: 19.8 s,
    18.2 s, then 0.06 s steady. A single warmup poisoned every round-5
    rehearsal train column (train_fps 70-100x under the steady rate)."""
    import jax

    key = jax.random.PRNGKey(1)
    for _ in range(2):
        if with_key:
            key, k = jax.random.split(key)
            carry = run(carry, k)
        else:
            carry = run(carry)
        _sync(carry)
    n_calls = 0
    t0 = time.perf_counter()
    while True:
        if with_key:
            key, k = jax.random.split(key)
            carry = run(carry, k)
        else:
            carry = run(carry)
        n_calls += 1
        if n_calls % 4 == 0:
            _sync(carry)
            if time.perf_counter() - t0 > seconds:
                break
    _sync(carry)
    dt = time.perf_counter() - t0
    return n_calls * steps_per_call * num_envs / dt


def _measure_step(env, num_envs, steps_per_call=32, seconds=3.0):
    import jax

    state = jax.jit(env.init_state)(jax.random.PRNGKey(0))
    act_dim = env.action_manager.total_action_dim if hasattr(
        env, "action_manager"
    ) else env.num_actions

    @jax.jit
    def run_chunk(s, key):
        # action buffers created INSIDE the trace — closing over an eager
        # device array forces a trace-time d2h copy over the axon tunnel.
        # All actions for the chunk come from ONE batched RNG call: a
        # per-step split+uniform costs as much as the whole cartpole physics
        # step and was the r1->r3 "cartpole regression" (31.3M -> 20.5M).
        actions = jax.random.uniform(
            key, (steps_per_call, num_envs, act_dim), minval=-1.0, maxval=1.0
        )

        def body(carry, action):
            s2, _out = env.step_state(carry, action)
            return s2, None

        s, _ = jax.lax.scan(body, s, actions)
        return s

    return _time_loop(run_chunk, state, steps_per_call, num_envs, seconds,
                      with_key=True)


def _make_runner(env, task_id):
    from isaaclab_tpu.rl import OnPolicyRunner, RslRlVecEnvWrapper
    from isaaclab_tpu.tasks.utils import load_cfg_from_registry

    agent_cfg = load_cfg_from_registry(task_id, "rsl_rl_cfg_entry_point")
    wrapped = RslRlVecEnvWrapper(env)
    return OnPolicyRunner(wrapped, agent_cfg, log_dir=None)


def _measure_inference(env, task_id, num_envs, steps_per_call=32, seconds=3.0):
    """Step + policy forward (reference '+inference' column: random-weight
    policy at init, deterministic action mean)."""
    import jax

    from isaaclab_tpu.rl.networks import normalize_obs

    runner = _make_runner(env, task_id)
    if runner.recurrent:
        raise RuntimeError("recurrent inference column not benched")
    ts = runner.init_train_state(seed=0)
    params = ts.update.params
    norm = ts.normalizer
    use_norm = runner.cfg.empirical_normalization
    net = runner.net

    @jax.jit
    def run_chunk(carry):
        def body(c, _):
            env_state, obs = c
            n_obs = normalize_obs(norm, obs) if use_norm else obs
            mean, _, _ = net.apply(params, n_obs, n_obs)
            action = mean
            env_state, obs2, _cobs, _r, _t, _to, _log = runner._env_step(
                env_state, action
            )
            return (env_state, obs2), None

        c, _ = jax.lax.scan(body, carry, None, length=steps_per_call)
        return c

    carry0 = (ts.env_state, ts.last_obs)
    return _time_loop(run_chunk, carry0, steps_per_call, num_envs, seconds)


def _measure_train(env, task_id, num_envs, seconds=6.0):
    """Full PPO train iterations (rollout + GAE + epochs of minibatch SGD) —
    the reference '+train' column."""
    import jax

    runner = _make_runner(env, task_id)
    ts = runner.init_train_state(seed=0)
    step = jax.jit(runner._train_iteration)
    steps_per_iter = runner.num_steps * num_envs

    def run(s):
        s2, _m = step(s)
        return s2

    return _time_loop(run, ts, steps_per_iter, 1, seconds)


def _peak_hbm_gb():
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
        peak = stats.get("peak_bytes_in_use") or stats.get("bytes_in_use")
        return round(peak / 2**30, 3) if peak else None
    except Exception:
        return None


def _env_manager_based(cfg_cls):
    def make(num_envs):
        from isaaclab_tpu.envs import ManagerBasedRLEnv

        cfg = cfg_cls()
        cfg.scene.num_envs = num_envs
        return ManagerBasedRLEnv(cfg)

    return make


def make_cartpole(num_envs):
    from isaaclab_tpu.tasks.manager_based.classic.cartpole.cartpole_env_cfg import (
        CartpoleEnvCfg,
    )

    return _env_manager_based(CartpoleEnvCfg)(num_envs)


def make_cartpole_camera(num_envs):
    from isaaclab_tpu.tasks.manager_based.classic.cartpole.cartpole_camera_env_cfg import (
        CartpoleRGBCameraEnvCfg,
    )

    return _env_manager_based(CartpoleRGBCameraEnvCfg)(num_envs)


def make_anymal_rough(num_envs):
    from isaaclab_tpu.tasks.manager_based.locomotion.velocity.config.anymal_c.rough_env_cfg import (
        AnymalCRoughEnvCfg,
    )

    return _env_manager_based(AnymalCRoughEnvCfg)(num_envs)


def make_anymal_flat(num_envs):
    from isaaclab_tpu.tasks.manager_based.locomotion.velocity.config.anymal_c.flat_env_cfg import (
        AnymalCFlatEnvCfg,
    )

    return _env_manager_based(AnymalCFlatEnvCfg)(num_envs)


def make_shadow(num_envs):
    import gymnasium as gym

    import isaaclab_tpu.tasks  # noqa: F401
    from isaaclab_tpu.tasks.utils import parse_env_cfg

    cfg = parse_env_cfg("Isaac-Repose-Cube-Shadow-Direct-v0", num_envs=num_envs)
    return gym.make(
        "Isaac-Repose-Cube-Shadow-Direct-v0", cfg=cfg
    ).unwrapped


# name -> (make_env, task_id for agent cfg, env-count env var, default envs,
#          steps per timed chunk, optional proxy note)
# ORDER MATTERS: cheapest compile first so a budget kill loses the least.
WORKLOADS = {
    "cartpole_env_step_fps_4096envs_1chip": (
        make_cartpole, "Isaac-Cartpole-v0",
        "BENCH_NUM_ENVS", 4096, 64, None,
    ),
    "anymal_flat_env_step_fps_8192envs_1chip": (
        make_anymal_flat, "Isaac-Velocity-Flat-Anymal-C-v0",
        "BENCH_FLAT_ENVS", 8192, 32, "north-star: BASELINE.json 5M @ 8192",
    ),
    "anymal_rough_env_step_fps_4096envs_1chip": (
        make_anymal_rough, "Isaac-Velocity-Rough-Anymal-C-v0",
        "BENCH_ROUGH_ENVS", 4096, 32, "Isaac-Velocity-Rough-G1-v0",
    ),
    "cartpole_camera_env_step_fps_1024envs_1chip": (
        make_cartpole_camera, "Isaac-Cartpole-RGB-v0",
        "BENCH_CAMERA_ENVS", 1024, 16, "Isaac-Cartpole-RGB-Camera-Direct-v0",
    ),
    # shadow LAST: its step graph alone compiles for ~20+ min on the axon
    # backend (no executable serialization -> the persistent cache cannot
    # help); every cheaper row must already be on stdout when the driver's
    # wall clamp lands
    "shadow_repose_env_step_fps_8192envs_1chip": (
        make_shadow, "Isaac-Repose-Cube-Shadow-Direct-v0",
        "BENCH_SHADOW_ENVS", 8192, 32, None,
    ),
}


def _emit_row(name, res, proxy):
    """Print the row for `name` with whatever columns exist in `res`."""
    base_step, base_infer, base_train = BASELINES[name]
    row = {
        "metric": name,
        "value": round(res["step"]),
        "unit": "env-steps/s",
        "vs_baseline": round(res["step"] / base_step, 4),
    }
    if "infer" in res:
        row["infer_fps"] = round(res["infer"])
        if base_infer:
            row["vs_baseline_infer"] = round(res["infer"] / base_infer, 4)
    if "train" in res:
        row["train_fps"] = round(res["train"])
        if base_train:
            row["vs_baseline_train"] = round(res["train"] / base_train, 4)
    hbm = _peak_hbm_gb()
    if hbm is not None:
        row["peak_hbm_gb"] = hbm
    if proxy:
        row["proxy_for"] = proxy
    print(json.dumps(row), flush=True)


def _run_one(name):
    """Child-process entry: run one workload, emitting the row INCREMENTALLY
    — step-only as soon as the step column lands, then re-emitted with the
    inference/train columns as each one completes. The last line is the most
    complete; earlier lines survive a parent-side deadline kill."""
    make_env, task_id, env_var, default_envs, spc, proxy = WORKLOADS[name]
    num_envs = int(os.environ.get(env_var, default_envs))
    # absolute epoch after which no NEW column should start
    child_deadline = float(os.environ.get("BENCH_CHILD_DEADLINE", "0")) or None

    def time_left():
        return float("inf") if child_deadline is None else child_deadline - time.time()

    env = make_env(num_envs)
    res = {"step": _measure_step(env, num_envs, steps_per_call=spc)}
    _emit_row(name, res, proxy)
    if os.environ.get("BENCH_STEP_ONLY"):
        return
    base_step, base_infer, base_train = BASELINES[name]
    if base_infer is None and base_train is None:
        # north-star rows have no reference inference/train columns —
        # don't spend two more cold compiles on numbers with no baseline
        return
    # each extra column needs headroom for a cold PPO-graph compile
    if time_left() > 90:
        try:
            res["infer"] = _measure_inference(env, task_id, num_envs,
                                              steps_per_call=spc)
            _emit_row(name, res, proxy)
        except Exception as ex:  # degrade to the columns that work
            print(f"# inference column failed: {ex!r}", file=sys.stderr)
    if time_left() > 120:
        try:
            res["train"] = _measure_train(env, task_id, num_envs)
            _emit_row(name, res, proxy)
        except Exception as ex:
            print(f"# train column failed: {ex!r}", file=sys.stderr)


def _stream_workload(name, deadline, step_only=False):
    """Run one workload in a child process, relaying its stdout rows the
    moment they appear; kill it at the per-workload/global deadline."""
    budget = min(WORKLOAD_TIMEOUT_S, deadline - time.time())
    child_env = dict(os.environ)
    child_env["BENCH_CHILD_DEADLINE"] = str(time.time() + budget - 45)
    if step_only or deadline - time.time() < STEP_ONLY_THRESHOLD_S:
        child_env["BENCH_STEP_ONLY"] = "1"
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--workload", name],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        env=child_env,
    )
    kill_at = time.time() + budget
    got_row = False

    # Reader THREAD, not select()+readline(): selecting on the raw fd while
    # reading through the buffered TextIO wrapper can block the loop past
    # the deadline (observed live: a child ran 30+ min beyond its kill
    # time while the parent sat in readline()).
    import queue as _queue
    import threading

    lines: "_queue.Queue[str|None]" = _queue.Queue()

    def _reader():
        try:
            for line in proc.stdout:
                lines.put(line)
        finally:
            lines.put(None)

    threading.Thread(target=_reader, daemon=True).start()

    eof = False
    killed = False
    while not eof:
        if not killed and time.time() > kill_at:
            proc.kill()
            killed = True
            print(f"# bench {name} hit deadline after {budget:.0f}s",
                  file=sys.stderr)
        try:
            line = lines.get(timeout=1.0)
        except _queue.Empty:
            continue
        if line is None:
            eof = True
        elif line.startswith("{"):
            print(line.rstrip("\n"), flush=True)
            got_row = True
        elif line.strip():
            print(f"# {name}: {line.rstrip()}", file=sys.stderr)
    proc.wait()
    if not got_row:
        print(f"# bench {name} produced no rows (rc={proc.returncode})",
              file=sys.stderr)


# Pass-2 priority: which workloads get the (expensive — a cold PPO-graph
# compile each) inference/train columns, in order of scoreboard value.
COLUMN_PRIORITY = [
    # cartpole first: its three columns land in ~15 min; rough's train
    # graph alone compiles ~30 min on the axon backend
    "cartpole_env_step_fps_4096envs_1chip",
    "anymal_rough_env_step_fps_4096envs_1chip",
    "shadow_repose_env_step_fps_8192envs_1chip",
    "cartpole_camera_env_step_fps_1024envs_1chip",
]


def main():
    """Two passes. Pass 1 measures the STEP column for every workload —
    each is one (cold) env-step compile, so all five rows land in ~35-45
    min even though the axon backend cannot cache executables. Pass 2
    re-runs baselined workloads with the inference/train columns (each a
    further cold compile of the PPO graph) in priority order until the
    global deadline. A single-pass design let one ~20-min train compile
    starve later workloads of their step rows entirely (round-4 failure
    mode, re-observed in the round-5 rehearsal)."""
    deadline = time.time() + GLOBAL_DEADLINE_S
    order = list(WORKLOADS)
    if os.environ.get("BENCH_HEADLINE_ONLY"):
        order = ["cartpole_env_step_fps_4096envs_1chip"]
    for name in order:
        remaining = deadline - time.time()
        if remaining < SKIP_THRESHOLD_S:
            print(f"# bench budget exhausted; skipped {name}", file=sys.stderr)
            continue
        _stream_workload(name, deadline, step_only=True)
    if os.environ.get("BENCH_STEP_ONLY") or os.environ.get(
        "BENCH_HEADLINE_ONLY"
    ):
        return
    for name in COLUMN_PRIORITY:
        remaining = deadline - time.time()
        if remaining < STEP_ONLY_THRESHOLD_S:
            print(
                f"# bench budget exhausted; no column pass for {name}",
                file=sys.stderr,
            )
            continue
        _stream_workload(name, deadline)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--workload":
        _run_one(sys.argv[2])
    else:
        main()
