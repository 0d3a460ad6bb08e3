"""Ant environment with crippled-leg task distribution.

Mirrors reference envs/ant_env.py: obs = [qpos, qvel, xmat(torso), com]
(dim 41); reward = forward COM velocity + 0.05 survive (ctrl/contact costs
zeroed out, ant_env.py:48-53); task 'cripple' disables one of legs 0-2
(leg 3 held out for meta-test, ant_env.py:105-106), zeroes its two actuators
and shrinks/relocates its geoms (collision only — inertia stays compiled-in,
matching MuJoCo post-compile geom_size mutation semantics).
"""
import dataclasses

import jax
import jax.numpy as jnp

from learning_to_adapt_tpu.envs.base import TPUEnv
from learning_to_adapt_tpu.envs.model_defs import get_model

# actuator pairs and geom pairs per crippled leg id (reference
# ant_env.py:108-188; geom indexing matches: floor=0, torso=1, then
# (aux, leg, ankle) triples per leg)
_ACT_PAIRS = ((2, 3), (4, 5), (6, 7), (0, 1))
_GEOM_PAIRS = ((3, 4), (6, 7), (9, 10), (12, 13))


class AntEnv(TPUEnv):
    name = 'ant'

    def __init__(self, task='cripple', reset_every_episode=False,
                 cripple_set=(0, 1, 2), **kw):
        """cripple_set: legs the per-episode task distribution draws from.
        Default (0, 1, 2) is the reference's train distribution — leg 3 is
        reserved for meta-test (reference ant_env.py:105-106). The meta-test
        protocol builds an eval env with cripple_set=(3,)."""
        from learning_to_adapt_tpu.utils.serializable import Serializable
        Serializable.quick_init(self, locals())
        self.cripple_set = tuple(int(g) for g in cripple_set)
        assert all(0 <= g <= 3 for g in self.cripple_set) and self.cripple_set
        super().__init__(task=task, reset_every_episode=reset_every_episode,
                         **kw)
        assert self.task in (None, 'cripple')

    def _build_model(self):
        return get_model('ant')

    def observe(self, data, phys):
        torso = self.model.body_id('torso')
        return jnp.concatenate([
            phys.qpos, phys.qvel,
            data.ximat[torso].reshape(-1),
            data.subtree_com[torso]])

    def step_reward(self, data, action):
        return self.body_comvel(data, 'torso')[0] + 0.05

    def reward(self, obs, act, next_obs):
        vel = (next_obs[..., -3] - obs[..., -3]) / self.dt
        return vel + 0.05

    def sample_task(self, key, mm, task):
        # draw from the configured leg set (default 0..2: leg 3 is the
        # meta-test holdout)
        legs = jnp.asarray(self.cripple_set, jnp.int32)
        leg = legs[jax.random.randint(key, (), 0, len(self.cripple_set))]
        mask = jnp.ones(self.act_dim, self.dtype)
        act_pairs = jnp.asarray(_ACT_PAIRS, jnp.int32)       # (4,2)
        mask = mask.at[act_pairs[leg]].set(0.0)

        geom_pairs = jnp.asarray(_GEOM_PAIRS, jnp.int32)     # (4,2)
        upper, lower = geom_pairs[leg][0], geom_pairs[leg][1]
        geom_size = mm.geom_size
        geom_pos = mm.geom_pos
        # halve (radius, half-length) of both leg geoms; collapse the lower
        # geom onto the upper one's position
        for g in (upper, lower):
            geom_size = geom_size.at[g, 0].multiply(0.5)
            geom_size = geom_size.at[g, 1].multiply(0.5)
        geom_pos = geom_pos.at[lower].set(geom_pos[upper])
        mm = dataclasses.replace(mm, geom_size=geom_size, geom_pos=geom_pos)
        return mm, dict(task, cripple_mask=mask)
