"""Functional environment API.

The reference's Env/MujocoEnv classes mutate a live MjModel
(envs/base.py:5-81, envs/mujoco_env.py:29-250). Here an environment is a
bundle of *pure functions* over an explicit EnvState pytree:

    reset(key, episode_idx) -> EnvState
    step(state, action)     -> (EnvState, obs, reward, done, info)
    reward(obs, act, next_obs)  # batched planner-side reward (the API the
                                # MPC controller requires; reference
                                # policies/mpc_controller.py:39)

so envs vmap over thousands of instances and jit into the sampler scan.
Dynamics perturbations ("tasks") are data inside EnvState.mm (a MutableModel)
plus env-specific extras in EnvState.task — sampled per episode with a PRNG
key, mirroring `reset_every_episode` semantics (reference
half_cheetah_env.py:67-72: the task resamples on every reset *after* the
first episode).
"""
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from learning_to_adapt_tpu.physics import engine
from learning_to_adapt_tpu.utils.serializable import Serializable
from learning_to_adapt_tpu.physics.spec import (
    MutableModel, PhysicsModel, default_mutable)


@jax.tree_util.register_dataclass
@dataclass
class EnvState:
    phys: Any         # PhysicsState
    mm: Any           # MutableModel (task-perturbed runtime model)
    task: Any         # dict of env-specific task variables (cripple_mask, ..)
    obs: Any          # (obs_dim,) current observation
    t: Any            # () int32 steps taken in current episode
    episode: Any      # () int32 episode counter (task resampling gate)
    rng: Any          # per-env PRNG key (action noise & future stochasticity)


class TPUEnv(Serializable):
    """Base env: subclasses define model, observation, reward and task
    sampling. Instances are static config only — safe to close over in jit.
    Serializable: pickling replays the constructor (the reference's rllab
    protocol, how env objects ride in params.pkl snapshots and replay
    tooling; utils/serializable.py)."""

    name: str = 'env'
    task_default: str = None

    def __init__(self, task=None, reset_every_episode=False, frame_skip=None,
                 action_noise=0.0, dtype=jnp.float32,
                 instability_recovery=True):
        if not getattr(self, '_serializable_initialized', False):
            # fallback capture for subclasses that do not quick_init
            Serializable.quick_init(self, locals())
        task = None if task == 'None' else task
        self.task = task
        self.reset_every_episode = reset_every_episode
        self.action_noise = action_noise
        # documented deviation from MuJoCo (which warns and carries on when
        # the sim diverges): replace blown-up states with the pre-step pose
        # + zero velocity. Off => raw engine output (the physics-parity
        # mode; docs/PARITY.md "instability recovery" note,
        # tests/test_envs.py::TestInstabilityRecovery)
        self.instability_recovery = instability_recovery
        self.dtype = dtype
        self.model: PhysicsModel = self._build_model()
        self.mm0: MutableModel = jax.tree.map(
            jnp.asarray, default_mutable(self.model, np.dtype(dtype)))
        self.frame_skip = (frame_skip if frame_skip is not None
                           else self.model.frame_skip)
        self.dt = self.model.timestep  # reference env.dt == opt.timestep
        self.act_dim = self.model.nu
        shapes = jax.eval_shape(self.reset, jax.random.PRNGKey(0))
        self.obs_dim = int(shapes.obs.shape[0])

    # ---- to implement in subclasses -------------------------------------
    def _build_model(self) -> PhysicsModel:
        raise NotImplementedError

    def observe(self, data: engine.ForwardData, phys) -> jnp.ndarray:
        raise NotImplementedError

    def step_reward(self, data, action):
        """True env reward from instantaneous forward data (the reference
        uses mj subtree-COM velocity, not finite differences:
        half_cheetah_env.py:52 via mjcore.py:54-83)."""
        raise NotImplementedError

    def reward(self, obs, act, next_obs):
        """Batched model-rollout reward from observations only."""
        raise NotImplementedError

    def sample_task(self, key, mm: MutableModel, task: dict):
        """Returns (mm, task) for a freshly sampled task."""
        return mm, task

    def default_task(self) -> dict:
        return dict(cripple_mask=jnp.ones(self.act_dim, self.dtype))

    def init_state(self, key):
        """Gaussian-perturbed initial (qpos, qvel) as in the reference
        (mujoco_env.py:81-101: qpos sigma .01, qvel sigma .1)."""
        init_qpos = (self.model.init_qpos if self.model.init_qpos is not None
                     else self.model.qpos0)
        k1, k2 = jax.random.split(key)
        qpos = jnp.asarray(init_qpos, self.dtype) + \
            0.01 * jax.random.normal(k1, (self.model.nq,), self.dtype)
        qvel = 0.1 * jax.random.normal(k2, (self.model.nv,), self.dtype)
        return engine.PhysicsState(qpos=qpos, qvel=qvel)

    # ---- generic machinery ----------------------------------------------
    def reset(self, key, episode_idx=0) -> EnvState:
        kt, ks, kr = jax.random.split(key, 3)
        mm, task = self.mm0, self.default_task()
        if self.reset_every_episode and self.task is not None:
            # the reference runs the *first* episode with the nominal task and
            # resamples from the second on (first=True gate)
            mm_s, task_s = self.sample_task(kt, mm, task)
            pick = episode_idx > 0
            mm = jax.tree.map(
                lambda a, b: jnp.where(pick, b, a), mm, mm_s)
            task = jax.tree.map(
                lambda a, b: jnp.where(pick, b, a), task, task_s)
        elif self.task is not None:
            mm, task = self.sample_task(kt, mm, task)

        phys = self.init_state(ks)
        data = engine.forward(self.model, mm, phys)
        state = EnvState(phys=phys, mm=mm, task=task,
                         obs=self.observe(data, phys),
                         t=jnp.zeros((), jnp.int32),
                         episode=jnp.asarray(episode_idx, jnp.int32),
                         rng=kr)
        return state

    def step(self, state: EnvState, action):
        """One env step: mask crippled actuators, frame_skip physics substeps,
        recompute observation/reward."""
        action = state.task['cripple_mask'] * action
        rng = state.rng
        if self.action_noise > 0:
            # noise proportional to the action range (reference
            # mujoco_env.py:151-158)
            rng, sub = jax.random.split(rng)
            lo, hi = self.action_space_bounds
            noise = self.action_noise * \
                jax.random.normal(sub, action.shape, action.dtype)
            action = action + 0.5 * (hi - lo) * noise
        phys = state.phys
        for _ in range(self.frame_skip):
            phys = engine.step(self.model, state.mm, phys, action)
        # instability recovery (the MuJoCo runtime warns and carries on when
        # the simulation diverges; under aggressive MPC exploitation the
        # solver can blow up — recover to the pre-step pose with zeroed
        # velocities so non-finite states never poison rollout datasets)
        # threshold: healthy joint velocities in this suite stay < ~50 rad/s;
        # 150 marks a physically meaningless state without clipping real
        # motion. Keeping such outliers out of rollouts is what protects the
        # meta-training loss from divergence (deltas of 1e3+ blow up the
        # second-order MAML objective).
        if self.instability_recovery:
            bad = jnp.logical_or(
                jnp.logical_not(jnp.all(jnp.isfinite(phys.qpos)) &
                                jnp.all(jnp.isfinite(phys.qvel))),
                jnp.max(jnp.abs(phys.qvel)) > 150.0)
            phys = engine.PhysicsState(
                qpos=jnp.where(bad, state.phys.qpos, phys.qpos),
                qvel=jnp.where(bad, jnp.zeros_like(phys.qvel), phys.qvel))
        # pass the applied ctrl so ForwardData.qfrc_actuator carries the
        # real actuator force (mj_forward fills it from d->ctrl)
        data = engine.forward(self.model, state.mm, phys, ctrl=action)
        obs = self.observe(data, phys)
        reward = self.step_reward(data, action)
        done = jnp.zeros((), bool)  # none of the five envs terminates early
        new_state = EnvState(phys=phys, mm=state.mm, task=state.task, obs=obs,
                             t=state.t + 1, episode=state.episode, rng=rng)
        return new_state, obs, reward, done, {}

    def log_diagnostics(self, paths, prefix=''):
        """Forward-progress stats over collected paths (reference
        half_cheetah_env.py:92-100 / ant_env.py:194-200: progress is the
        change in obs[-3], the COM x position)."""
        from learning_to_adapt_tpu.utils import logging as logger
        obs = paths['observations'] if isinstance(paths, dict) else \
            np.stack([p['observations'] for p in paths])
        progs = obs[:, -1, -3] - obs[:, 0, -3]
        logger.logkv(prefix + 'AverageForwardProgress', float(progs.mean()))
        logger.logkv(prefix + 'MaxForwardProgress', float(progs.max()))
        logger.logkv(prefix + 'MinForwardProgress', float(progs.min()))
        logger.logkv(prefix + 'StdForwardProgress', float(progs.std()))

    # convenience accessors ------------------------------------------------
    def body_comvel(self, data, body_name):
        return data.subtree_comvel[self.model.body_id(body_name)]

    def body_com(self, data, body_name):
        return data.subtree_com[self.model.body_id(body_name)]

    @property
    def action_space_bounds(self):
        lo = jnp.asarray(self.model.act_ctrlrange[:, 0], self.dtype)
        hi = jnp.asarray(self.model.act_ctrlrange[:, 1], self.dtype)
        return lo, hi

    @property
    def action_space(self):
        """rllab-style Box from actuator ctrlrange (reference
        mujoco_env.py:64-69)."""
        from learning_to_adapt_tpu.envs import spaces
        return spaces.Box(self.model.act_ctrlrange[:, 0],
                          self.model.act_ctrlrange[:, 1])

    @property
    def observation_space(self):
        from learning_to_adapt_tpu.envs import spaces
        big = 1e6
        return spaces.Box(-big * np.ones(self.obs_dim),
                          big * np.ones(self.obs_dim))

    @property
    def spec(self):
        from learning_to_adapt_tpu.envs.env_spec import EnvSpec
        return EnvSpec(self.observation_space, self.action_space)


class NormalizedEnv(Serializable):
    """Action-normalizing wrapper: planner/policy space is [-1,1]^act_dim,
    rescaled and clipped to the env bounds (reference
    envs/normalized_env.py:126-134).

    Optional running mean/std normalization of observations and rewards
    (reference normalized_env.py:90-106) — off by default, matching the
    reference run scripts; when enabled it applies on the host-facing step
    path (the fused on-device sampler always consumes raw observations, as
    the reference's model pipeline does). The reference's `scale_reward`
    argument is ignored there via a hard-coded 1 (normalized_env.py:48) —
    preserved."""

    def __init__(self, env: TPUEnv, scale_reward=1.0,
                 normalize_obs=False, normalize_reward=False,
                 obs_alpha=0.001, reward_alpha=0.001):
        Serializable.quick_init(self, locals())
        self.wrapped_env = env
        self._scale_reward = 1  # reference quirk: argument ignored
        self._normalize_obs = normalize_obs
        self._normalize_reward = normalize_reward
        self._obs_alpha = obs_alpha
        self._obs_mean = np.zeros(env.obs_dim)
        self._obs_var = np.ones(env.obs_dim)
        self._reward_alpha = reward_alpha
        self._reward_mean = 0.0
        self._reward_var = 1.0

    def _update_obs_estimate(self, obs):
        o = np.asarray(obs)
        a = self._obs_alpha
        self._obs_mean = (1 - a) * self._obs_mean + a * o
        self._obs_var = (1 - a) * self._obs_var + \
            a * np.square(o - self._obs_mean)

    def _update_reward_estimate(self, reward):
        a = self._reward_alpha
        r = float(reward)
        self._reward_mean = (1 - a) * self._reward_mean + a * r
        self._reward_var = (1 - a) * self._reward_var + \
            a * np.square(r - self._reward_mean)

    def maybe_normalize(self, obs, reward):
        """Host-path running normalization (no-op unless enabled)."""
        if self._normalize_obs:
            self._update_obs_estimate(obs)
            obs = (np.asarray(obs) - self._obs_mean) / \
                (np.sqrt(self._obs_var) + 1e-8)
        if self._normalize_reward:
            self._update_reward_estimate(reward)
            reward = float(reward) / (np.sqrt(self._reward_var) + 1e-8)
        return obs, reward

    def __getattr__(self, name):
        # never delegate private/dunder lookups: protocol probes (pickle,
        # copy, Serializable.quick_init before wrapped_env exists) must get
        # AttributeError, not recurse through the delegation chain
        if name.startswith('_') or name == 'wrapped_env':
            raise AttributeError(name)
        return getattr(self.wrapped_env, name)

    @property
    def action_space(self):
        from learning_to_adapt_tpu.envs import spaces
        d = self.wrapped_env.act_dim
        return spaces.Box(-np.ones(d), np.ones(d))

    def action_lo_hi(self):
        return self.wrapped_env.action_space_bounds

    def denormalize_action(self, action):
        lo, hi = self.wrapped_env.action_space_bounds
        scaled = lo + (action + 1.0) * 0.5 * (hi - lo)
        return jnp.clip(scaled, lo, hi)

    def step(self, state, action):
        return self.wrapped_env.step(state, self.denormalize_action(action))

    def reset(self, key, episode_idx=0):
        return self.wrapped_env.reset(key, episode_idx)

    def reward(self, obs, act, next_obs):
        # planner actions are normalized; the reference evaluates env.reward
        # on the *normalized* actions too (ctrl cost in planner space)
        return self.wrapped_env.reward(obs, act, next_obs)


def normalize(env: TPUEnv) -> NormalizedEnv:
    return NormalizedEnv(env)
