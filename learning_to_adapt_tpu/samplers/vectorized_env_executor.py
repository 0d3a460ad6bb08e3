"""Host-facing vectorized env executors (API parity with reference
samplers/vectorized_env_executor.py).

The reference offers two implementations: an in-process python loop
(IterativeEnvExecutor) and a fork-per-worker Pipe-RPC pool
(ParallelEnvExecutor). On TPU both collapse into one thing: a vmapped env
state pytree stepped by a single jitted program — `n_parallel` worth of
processes is replaced by the batch axis (and mesh sharding across chips).
These classes keep the reference's step/reset/num_envs surface for
host-driven loops (replay tooling, interop); training uses the fused
sampler (samplers/rollout.py) which never leaves the device.

Auto-reset semantics match the reference worker loop
(vectorized_env_executor.py:44-47, 188-192): an env resets when done or when
its step count reaches max_path_length, and episode boundaries resample the
task (reset_every_episode).
"""
import jax
import jax.numpy as jnp
import numpy as np


class IterativeEnvExecutor:
    """Batched on-device executor. (The name is kept for API parity; there
    is nothing iterative about it anymore.)"""

    def __init__(self, env, num_rollouts, max_path_length, seed=0):
        self.env = env
        self._num_envs = num_rollouts
        self.max_path_length = max_path_length
        self._key = jax.random.PRNGKey(seed)
        self._states = None
        self._episode = np.zeros(num_rollouts, np.int64)

        self._reset_one = jax.jit(jax.vmap(env.reset))

        def _step(states, actions, keys, episodes):
            states, obs, rewards, dones, _ = jax.vmap(env.step)(states,
                                                                actions)
            # auto-reset when the path hits max_path_length
            timeout = states.t >= max_path_length
            done_or_timeout = dones | timeout
            fresh = jax.vmap(env.reset)(keys, episodes)
            states = jax.tree.map(
                lambda f, s: jnp.where(
                    done_or_timeout.reshape((-1,) + (1,) * (f.ndim - 1)),
                    f, s), fresh, states)
            return states, obs, rewards, done_or_timeout

        self._step_jit = jax.jit(_step)

    @property
    def num_envs(self):
        return self._num_envs

    def reset(self):
        self._key, sub = jax.random.split(self._key)
        keys = jax.random.split(sub, self._num_envs)
        self._states = self._reset_one(
            keys, jnp.asarray(self._episode))
        return np.asarray(self._states.obs)

    def step(self, actions):
        assert self._states is not None, 'call reset() first'
        self._key, sub = jax.random.split(self._key)
        keys = jax.random.split(sub, self._num_envs)
        next_episode = jnp.asarray(self._episode + 1)
        self._states, obs, rewards, dones, = self._step_jit(
            self._states, jnp.asarray(actions), keys, next_episode)
        dones_np = np.asarray(dones)
        self._episode = np.where(dones_np, self._episode + 1, self._episode)
        obs_np, rew_np = np.asarray(obs), np.asarray(rewards)
        # host-path running obs/reward normalization (NormalizedEnv
        # normalize_obs/normalize_reward; reference normalized_env.py:90-106)
        # — a no-op unless those flags are on, like the reference default
        maybe_norm = getattr(self.env, 'maybe_normalize', None)
        if maybe_norm is not None:
            outs = [maybe_norm(obs_np[i], rew_np[i])
                    for i in range(self._num_envs)]
            obs_np = np.asarray([o for o, _ in outs])
            rew_np = np.asarray([r for _, r in outs])
        return (obs_np, rew_np, dones_np,
                [{} for _ in range(self._num_envs)])

    def set_tasks(self, tasks=None):
        # tasks are data sampled inside env.reset; forcing specific values
        # is done by seeding (kept for API parity)
        pass


# On TPU there is no separate multi-process pool — the batch axis plays that
# role; keep the reference's name importable.
ParallelEnvExecutor = IterativeEnvExecutor
