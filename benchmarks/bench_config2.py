"""BASELINE.json config #2 measurement: HalfCheetah, CEM planner, 1024
vmapped envs, NN-ensemble dynamics — the saturated ensemble+CEM regime.

Prints aux-metric JSON lines (same schema as bench.py's stderr lines).
"""
import json
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

from learning_to_adapt_tpu.envs import HalfCheetahEnv, normalize  # noqa: E402
from learning_to_adapt_tpu.models import MLPDynamicsModel  # noqa: E402
from learning_to_adapt_tpu.policies import MPCController  # noqa: E402
from learning_to_adapt_tpu.samplers.rollout import make_rollout_fn  # noqa: E402
from learning_to_adapt_tpu.utils.jax_cache import (  # noqa: E402
    enable_persistent_cache)


def main():
    enable_persistent_cache()
    num_envs, path_len = 1024, 32
    n_cand, horizon, cem_iters = 64, 10, 3
    env = normalize(HalfCheetahEnv(task=None, reset_every_episode=True))
    model = MLPDynamicsModel('dyn', env, hidden_sizes=(512, 512),
                             batch_size=128, n_members=5)
    policy = MPCController('policy', env, model, n_candidates=n_cand,
                           horizon=horizon, use_cem=True,
                           num_cem_iters=cem_iters)
    rollout = make_rollout_fn(env, policy, model, num_envs, path_len)
    key = jax.random.PRNGKey(0)
    for i in range(2):  # compile + settle
        out = rollout(model.params, model.normalizer,
                      jax.random.fold_in(key, 100 + i), np.int32(1))
        jax.block_until_ready(out)
    times = []
    for i in range(6):
        t0 = time.perf_counter()
        out = rollout(model.params, model.normalizer,
                      jax.random.fold_in(key, i), np.int32(1))
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    sps = num_envs * path_len / min(times)
    print(json.dumps({
        'metric': 'config#2 env-steps/s/chip (1024 envs, CEM x3, '
                  '5-member ensemble, (512,512))',
        'value': round(sps, 1), 'unit': 'env-steps/s'}))


if __name__ == '__main__':
    main()
