"""Latency decomposition of a sampling step: time the fused rollout in
stacked modes and difference them.

  random            physics only (uniform actions, no model)
  planned           physics + planner (pre-update model, no adapt)
  planned + adapt   + per-step adaptation (canonical GrBAL shape only)

The differences attribute wall-clock per env step to physics / planner /
adaptation, guiding where the next latency optimization should go.

Shapes:
  canonical   5 envs x 500 candidates x horizon 10, (512,512,512) meta
              model with per-step adaptation — the latency-bound regime
              the actual experiments run (DESIGN.md section 1's 22.5/35.7/
              5.1 us decomposition)
  saturated   512 envs x 128 candidates x horizon 10, (512,512) MLP —
              the throughput-bound headline shape (VERDICT round-4 weak
              #4: explain where the non-planner time goes at the shape
              whose MFU is quoted)
"""
import argparse
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

from learning_to_adapt_tpu.envs import HalfCheetahEnv, normalize  # noqa: E402
from learning_to_adapt_tpu.models import (  # noqa: E402
    MetaMLPDynamicsModel, MLPDynamicsModel)
from learning_to_adapt_tpu.policies import MPCController  # noqa: E402
from learning_to_adapt_tpu.samplers.rollout import make_rollout_fn  # noqa: E402
from learning_to_adapt_tpu.utils.jax_cache import (  # noqa: E402
    enable_persistent_cache)


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


def decompose(env, model, policy, n_envs, path, adapt_bs, n_timed=4):
    modes = {
        'random': make_rollout_fn(env, policy, model, n_envs, path,
                                  random=True),
        'planned': make_rollout_fn(env, policy, model, n_envs, path),
    }
    if adapt_bs:
        modes['planned+adapt'] = make_rollout_fn(
            env, policy, model, n_envs, path, adapt_batch_size=adapt_bs)
    key = jax.random.PRNGKey(0)
    t = {name: timed(fn, model, n_timed, key) for name, fn in modes.items()}
    steps = n_envs * path
    us = {k: v / steps * 1e6 for k, v in t.items()}
    full = us.get('planned+adapt', us['planned'])
    line = (f'per env-step (us): physics={us["random"]:.2f} '
            f'+planner={us["planned"] - us["random"]:.2f}')
    if adapt_bs:
        line += f' +adapt={us["planned+adapt"] - us["planned"]:.2f}'
    print(line + f' total={full:.2f}')
    print(f'physics share of total: '
          f'{us["random"] / full * 100:.1f}%; planner share: '
          f'{(us["planned"] - us["random"]) / full * 100:.1f}%')
    for k in modes:
        print(f'{k}: {t[k] * 1e3:.1f} ms / {steps} steps '
              f'({steps / t[k]:.0f} steps/s)')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--shape', choices=('canonical', 'saturated'),
                   default='canonical')
    p.add_argument('--n_envs', type=int, default=None,
                   help='override the shape\'s env count (e.g. 256)')
    args = p.parse_args()
    enable_persistent_cache()

    if args.shape == 'canonical':
        n_envs, path, n_cand, horizon = args.n_envs or 5, 1000, 500, 10
        env = normalize(HalfCheetahEnv(task=None, reset_every_episode=True))
        model = MetaMLPDynamicsModel('dyn', env, meta_batch_size=10,
                                     hidden_sizes=(512, 512, 512),
                                     batch_size=16)
        adapt_bs = 16
    else:
        # exactly bench.py::bench_saturated's workload
        n_envs, path, n_cand, horizon = args.n_envs or 512, 64, 128, 10
        env = normalize(HalfCheetahEnv(task='cripple',
                                       reset_every_episode=True))
        model = MLPDynamicsModel('dyn', env, hidden_sizes=(512, 512),
                                 batch_size=128)
        adapt_bs = None
    policy = MPCController('policy', env, model, n_candidates=n_cand,
                           horizon=horizon)
    print(f'shape={args.shape}: {n_envs} envs x {n_cand} candidates x '
          f'horizon {horizon}, path {path}')
    decompose(env, model, policy, n_envs, path, adapt_bs)


if __name__ == '__main__':
    main()
