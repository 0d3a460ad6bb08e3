"""Latency decomposition of the canonical GrBAL sampling step (5 envs,
500 candidates, horizon 10, (512,512,512) meta model, per-step
adaptation): time the fused rollout in three modes and difference them.

  random            physics only (uniform actions, no model)
  planned           physics + planner (pre-update model, no adapt)
  planned + adapt   the full canonical pipeline

The differences attribute wall-clock per env step to physics / planner /
adaptation, guiding where the next latency optimization should go.
"""
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

from learning_to_adapt_tpu.envs import HalfCheetahEnv, normalize  # noqa: E402
from learning_to_adapt_tpu.models import MetaMLPDynamicsModel  # noqa: E402
from learning_to_adapt_tpu.policies import MPCController  # noqa: E402
from learning_to_adapt_tpu.samplers.rollout import make_rollout_fn  # noqa: E402
from learning_to_adapt_tpu.utils.jax_cache import (  # noqa: E402
    enable_persistent_cache)

N_ENVS, PATH, N_CAND, HORIZON = 5, 1000, 500, 10


def timed(rollout, model, n, key):
    for i in range(2):
        out = rollout(model.params, model.normalizer,
                      jax.random.fold_in(key, 100 + i), np.int32(1))
        jax.block_until_ready(out)
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        out = rollout(model.params, model.normalizer,
                      jax.random.fold_in(key, i), np.int32(1))
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    enable_persistent_cache()
    env = normalize(HalfCheetahEnv(task=None, reset_every_episode=True))
    model = MetaMLPDynamicsModel('dyn', env, meta_batch_size=10,
                                 hidden_sizes=(512, 512, 512), batch_size=16)
    policy = MPCController('policy', env, model, n_candidates=N_CAND,
                           horizon=HORIZON)
    key = jax.random.PRNGKey(0)

    modes = {
        'random': make_rollout_fn(env, policy, model, N_ENVS, PATH,
                                  random=True),
        'planned': make_rollout_fn(env, policy, model, N_ENVS, PATH),
        'planned+adapt': make_rollout_fn(env, policy, model, N_ENVS, PATH,
                                         adapt_batch_size=16),
    }
    t = {name: timed(fn, model, 4, key) for name, fn in modes.items()}
    steps = N_ENVS * PATH
    us = {k: v / steps * 1e6 for k, v in t.items()}
    print(f'per env-step (us): physics={us["random"]:.1f} '
          f'+planner={us["planned"] - us["random"]:.1f} '
          f'+adapt={us["planned+adapt"] - us["planned"]:.1f} '
          f'total={us["planned+adapt"]:.1f}')
    for k in modes:
        print(f'{k}: {t[k] * 1e3:.1f} ms / {steps} steps '
              f'({steps / t[k]:.0f} steps/s)')


if __name__ == '__main__':
    main()
