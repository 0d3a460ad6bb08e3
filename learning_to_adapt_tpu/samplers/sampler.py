"""Sampler: collects `num_rollouts` paths of `max_path_length` steps per
call, entirely on device (API parity with reference samplers/sampler.py).

`n_parallel` is accepted for config compatibility but meaningless here: the
reference forks worker processes to parallelize envs
(vectorized_env_executor.py:72-213); this framework vmaps env state on one
chip and shards the env axis across chips (parallel/), so every call is
"fully parallel".
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from learning_to_adapt_tpu.samplers.rollout import make_rollout_fn
from learning_to_adapt_tpu.utils import logging as logger


class Sampler:
    def __init__(self, env, policy, num_rollouts, max_path_length,
                 n_parallel=1, adapt_batch_size=None, seed=0, mesh=None,
                 ablate_hidden=None, ablate_warmup=16):
        self.env = env
        self.policy = policy
        self.num_rollouts = num_rollouts
        self.max_path_length = max_path_length
        self.adapt_batch_size = adapt_batch_size
        # recurrent-adaptation ablation mode (None | 'zero' | 'frozen'),
        # eval-only — benchmarks/meta_test.py's ReBAL mechanism isolation
        self.ablate_hidden = ablate_hidden
        self.ablate_warmup = ablate_warmup
        self.total_samples = num_rollouts * max_path_length
        self.total_timesteps_sampled = 0
        self._episode_idx = 0
        self._key = jax.random.PRNGKey(seed)
        self._fns = {}
        # optional device mesh: the env/rollout axis shards over mesh axis
        # 'env' (multi-chip / multi-host scale-out; parallel/mesh.py)
        self.mesh = mesh
        if mesh is not None:
            n_env_shards = mesh.shape['env']
            assert num_rollouts % n_env_shards == 0, (
                f'num_rollouts {num_rollouts} must divide over the env mesh '
                f'axis ({n_env_shards})')

    def _rollout_fn(self, random):
        if random not in self._fns:
            self._fns[random] = make_rollout_fn(
                self.env, self.policy, self.policy.dynamics_model,
                self.num_rollouts, self.max_path_length,
                adapt_batch_size=self.adapt_batch_size, random=random,
                mesh=self.mesh, ablate_hidden=self.ablate_hidden,
                ablate_warmup=self.ablate_warmup)
        return self._fns[random]

    def obtain_samples(self, log=False, log_prefix='', random=False):
        t0 = time.time()
        model = self.policy.dynamics_model
        self._key, sub = jax.random.split(self._key)
        fn = self._rollout_fn(random)
        params, norm = model.params, model.normalizer
        # multi-controller: replicate host-local inputs onto the spanning
        # mesh (every process holds identical values — same seeds, same
        # fit trajectory); afterwards gather() allgathers the env-sharded
        # paths so host-side fit/logging sees all of them
        multi = self.mesh is not None and jax.process_count() > 1
        if multi:
            from learning_to_adapt_tpu.parallel import mesh as par_mesh
            params, norm, sub = par_mesh.stage(
                self.mesh, (params, norm, sub))
        paths = fn(params, norm, sub, np.int32(self._episode_idx))
        paths = (par_mesh.gather(paths) if multi
                 else jax.device_get(paths))
        paths = jax.tree.map(np.asarray, paths)
        self._episode_idx += 1
        self.total_timesteps_sampled += self.total_samples
        if log:
            logger.logkv(log_prefix + 'TimeStepsCtr',
                         self.total_timesteps_sampled)
            logger.logkv(log_prefix + 'PolicyExecTime', time.time() - t0)
            logger.logkv(log_prefix + 'EnvExecTime', 0.0)  # fused on device
        return paths

    def update_tasks(self):
        pass  # tasks are resampled inside env.reset (task-as-data)

    # ---- resume fidelity: the PRNG key and episode counter determine the
    # task/reset sequence, so a resumed run continues the exact stream a
    # fresh run would have produced (utils/checkpoint.py)
    def state_dict(self):
        return dict(key=np.asarray(self._key),
                    episode_idx=self._episode_idx,
                    total_timesteps_sampled=self.total_timesteps_sampled)

    def load_state_dict(self, sd):
        self._key = jnp.asarray(sd['key'])
        self._episode_idx = int(sd['episode_idx'])
        self.total_timesteps_sampled = int(sd['total_timesteps_sampled'])


class ModelSampleProcessor:
    """Reference samplers/model_sample_processor.py: shapes rollout arrays
    for model fitting. recurrent=True keeps the [n_paths, T, dim] layout
    (GrBAL/ReBAL); recurrent=False flattens to 2-D (MB-MPC)."""

    def __init__(self, recurrent=False):
        self.recurrent = recurrent

    def process_samples(self, paths, log=False, log_prefix=''):
        obs = paths['observations']
        nxt = paths['next_observations']
        act = paths['actions']
        rew = paths['rewards']
        assert obs.ndim == 3
        ret = rew.sum(axis=1)
        if log:
            logger.logkv(log_prefix + 'AverageReturn', float(ret.mean()))
            logger.logkv(log_prefix + 'MaxReturn', float(ret.max()))
            logger.logkv(log_prefix + 'MinReturn', float(ret.min()))
            logger.logkv(log_prefix + 'StdReturn', float(ret.std()))
        if self.recurrent:
            return dict(observations=obs, next_observations=nxt, actions=act,
                        rewards=rew, returns=ret)
        d = obs.shape[-1]
        return dict(
            observations=obs.reshape(-1, d),
            next_observations=nxt.reshape(-1, d),
            actions=act.reshape(-1, act.shape[-1]),
            rewards=rew.reshape(-1),
            returns=ret)
