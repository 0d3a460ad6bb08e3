"""Micro-benchmarks for the hot paths (run on real TPU; use
JAX_PLATFORMS=cpu for a smoke pass).

    python benchmarks/microbench.py [--envs 1024] [--quick]

Reports steady-state throughput of:
  physics   — raw batched env.step (no planner): env-steps/s
  planner   — one RS planning call (model rollouts only): plans/s + model-row
              throughput
  fused     — the full sampling program (plan + physics per step)
  fit       — MLP dynamics training epoch: transitions/s
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), '.jax_cache')
os.makedirs(_CACHE, exist_ok=True)
jax.config.update('jax_compilation_cache_dir', _CACHE)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--envs', type=int, default=512)
    p.add_argument('--candidates', type=int, default=128)
    p.add_argument('--horizon', type=int, default=10)
    p.add_argument('--steps', type=int, default=32)
    p.add_argument('--quick', action='store_true')
    p.add_argument('--cpu', action='store_true',
                   help='force the CPU backend (env vars are not enough if '
                        'a TPU plugin pre-imported jax)')
    args = p.parse_args()
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    if args.quick:
        args.envs, args.candidates, args.steps = 16, 8, 4

    from learning_to_adapt_tpu.envs import HalfCheetahEnv, normalize
    from learning_to_adapt_tpu.models import MLPDynamicsModel
    from learning_to_adapt_tpu.policies import MPCController
    from learning_to_adapt_tpu.samplers.rollout import make_rollout_fn

    env = normalize(HalfCheetahEnv(task='cripple', reset_every_episode=True))
    model = MLPDynamicsModel('dyn', env, hidden_sizes=(512, 512))
    policy = MPCController('policy', env, model,
                           n_candidates=args.candidates,
                           horizon=args.horizon)
    results = {}

    # --- raw physics ---
    keys = jax.random.split(jax.random.PRNGKey(0), args.envs)
    reset = jax.jit(jax.vmap(lambda k: env.reset(k, np.int32(1))))
    states = reset(keys)
    acts = jnp.zeros((args.envs, env.act_dim))
    stepf = jax.jit(lambda s: jax.vmap(env.step)(s, acts)[0].phys.qpos)
    dt = timeit(stepf, states)
    results['physics_env_steps_per_s'] = round(args.envs / dt, 1)

    # --- planner only ---
    obs = states.obs

    def plan(o, key):
        def predict(orows, arows):
            return model.predict_fn(model.params, model.normalizer, orows,
                                    arows)
        return policy.plan_fn(predict, o, key)

    planf = jax.jit(plan)
    dt = timeit(planf, obs, jax.random.PRNGKey(1))
    results['planner_plans_per_s'] = round(args.envs / dt, 1)
    results['planner_model_rows_per_s'] = round(
        args.envs * args.candidates * args.horizon / dt, 1)

    # --- fused rollout ---
    rollout = make_rollout_fn(env, policy, model, args.envs, args.steps)
    dt = timeit(rollout, model.params, model.normalizer,
                jax.random.PRNGKey(2), np.int32(1), iters=2)
    results['fused_env_steps_per_s'] = round(args.envs * args.steps / dt, 1)

    # --- fit epoch ---
    rng = np.random.RandomState(0)
    n = 50000 if not args.quick else 2000
    obs_d = rng.randn(n, env.obs_dim).astype(np.float32)
    act_d = rng.randn(n, env.act_dim).astype(np.float32)
    t0 = time.perf_counter()
    model.fit(obs_d, act_d, obs_d * 0.99, epochs=5)
    dt = (time.perf_counter() - t0) / 5
    results['fit_transitions_per_s'] = round(n / dt, 1)

    print(json.dumps(results, indent=2))


if __name__ == '__main__':
    main()
