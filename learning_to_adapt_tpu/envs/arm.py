"""7-DoF arm reacher with cripple/damping/mass/force task distributions.

Mirrors reference envs/arm_7dof_env.py: obs = [qpos, qvel, com(object) -
com(target)] (dim 23); reward = -|object-target| - 0.005*|a|^2
(arm_7dof_env.py:38-45, 91-99); custom reset with fixed goal (the reference
hard-sets fixed_goal=True at :54 — preserved) and uniform qvel noise.
"""
import dataclasses

import jax
import jax.numpy as jnp

from learning_to_adapt_tpu.envs.base import TPUEnv
from learning_to_adapt_tpu.physics import engine
from learning_to_adapt_tpu.envs.model_defs import get_model


class Arm7DofEnv(TPUEnv):
    name = 'arm_7dof'

    def __init__(self, task='force', reset_every_episode=False,
                 fixed_goal=False, force_range=(0.1, 2.0), **kw):
        """force_range: (lo, hi) of the per-episode uniform draw of the
        downward pseudo-gravity g on the object for the 'force' task
        (reference arm_7dof_env.py:124-130 hard-codes U(0.1, 2)). The
        continuous-OOD meta-test protocol trains on the default range and
        evaluates on an extrapolated one, e.g. (3, 6)."""
        from learning_to_adapt_tpu.utils.serializable import Serializable
        Serializable.quick_init(self, locals())
        self.force_range = (float(force_range[0]), float(force_range[1]))
        assert self.force_range[0] <= self.force_range[1]
        super().__init__(task=task, reset_every_episode=reset_every_episode,
                         **kw)
        assert self.task in (None, 'cripple', 'damping', 'mass', 'force')

    def _build_model(self):
        return get_model('arm_7dof')

    def init_state(self, key):
        """Reference reset (arm_7dof_env.py:48-73): qpos = 0.5 everywhere,
        goal (0.3, 0.15, 0) written into the target slide joints, qvel
        uniform(-.005,.005) noise with the target at rest."""
        qpos = jnp.full((self.model.nq,), 0.5, self.dtype)
        goal = jnp.asarray([0.3, 0.15, 0.0], self.dtype)
        qpos = qpos.at[-3:].set(goal)
        qvel = jax.random.uniform(key, (self.model.nv,), self.dtype,
                                  -0.005, 0.005)
        qvel = qvel.at[-3:].set(0.0)
        return engine.PhysicsState(qpos=qpos, qvel=qvel)

    def observe(self, data, phys):
        obj = self.model.body_id('object')
        tgt = self.model.body_id('target')
        return jnp.concatenate([
            phys.qpos, phys.qvel,
            data.subtree_com[obj] - data.subtree_com[tgt]])

    def step_reward(self, data, action):
        obj = self.model.body_id('object')
        tgt = self.model.body_id('target')
        vec = data.subtree_com[obj] - data.subtree_com[tgt]
        reward_dist = -jnp.linalg.norm(vec)
        reward_ctrl = -jnp.sum(jnp.square(action))
        return reward_dist + 0.01 * 0.5 * reward_ctrl

    def reward(self, obs, act, next_obs):
        vec = next_obs[..., -3:]
        reward_dist = -jnp.linalg.norm(vec, axis=-1)
        reward_ctrl = -jnp.sum(jnp.square(act), axis=-1)
        return reward_dist + 0.01 * 0.5 * reward_ctrl

    def log_diagnostics(self, paths, prefix=''):
        """Final distance-to-target stats (obs[-3:] is object-target)."""
        import numpy as np
        from learning_to_adapt_tpu.utils import logging as logger
        obs = paths['observations'] if isinstance(paths, dict) else \
            np.stack([p['observations'] for p in paths])
        dist = np.linalg.norm(obs[:, -1, -3:], axis=-1)
        logger.logkv(prefix + 'AverageFinalDistance', float(dist.mean()))
        logger.logkv(prefix + 'MinFinalDistance', float(dist.min()))

    def sample_task(self, key, mm, task):
        obj = self.model.body_id('object')
        if self.task == 'cripple':
            crippled = jax.random.randint(key, (), 0, 7)
            mask = jnp.ones(self.act_dim, self.dtype).at[crippled].set(0.0)
            return mm, dict(task, cripple_mask=mask)
        if self.task == 'damping':
            # reference quirk preserved: all dofs (incl. target_x) get random
            # damping, only the last two target dofs are zeroed
            # (arm_7dof_env.py:112-115)
            damp = jax.random.uniform(key, (self.model.nv,), self.dtype,
                                      0.0, 2.0)
            damp = damp.at[-2:].set(0.0)
            return dataclasses.replace(mm, dof_damping=damp), task
        if self.task == 'mass':
            # object mass multiplier in {1,2,3}; applied to the compiled
            # mass (the reference compounds across episodes through a
            # missing .copy() at arm_7dof_env.py:121-124 — consciously fixed)
            mult = jax.random.randint(key, (), 1, 4).astype(self.dtype)
            mass = mm.body_mass.at[obj].set(
                jnp.asarray(self.model.body_mass0[obj], self.dtype) * mult)
            return dataclasses.replace(mm, body_mass=mass), task
        if self.task == 'force':
            # downward force -m*g on the object, g ~ U(force_range)
            # (reference default U(.1, 2))
            g = jax.random.uniform(key, (), self.dtype, *self.force_range)
            xfrc = jnp.zeros_like(mm.xfrc_applied)
            xfrc = xfrc.at[obj, 2].set(-mm.body_mass[obj] * g)
            return dataclasses.replace(mm, xfrc_applied=xfrc), task
        return mm, task
