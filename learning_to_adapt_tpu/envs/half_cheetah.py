"""HalfCheetah environments: nominal/crippled, heightfield, blocks.

Observation/reward layouts and task distributions mirror the reference
(envs/half_cheetah_env.py, half_cheetah_hfield_env.py,
half_cheetah_blocks_env.py); the obs layout is load-bearing because the
planner reward finite-differences obs[:, -3] (COM x) —
half_cheetah_env.py:58-65.
"""
import dataclasses

import jax
import jax.numpy as jnp

from learning_to_adapt_tpu.envs.base import TPUEnv
from learning_to_adapt_tpu.envs.model_defs import get_model


class HalfCheetahEnv(TPUEnv):
    """obs = [qpos[1:], qvel, subtree_com(torso)] (dim 20).

    task 'cripple': zero one actuator of 1..5 (bthigh never crippled;
    reference half_cheetah_env.py:74-88)."""

    name = 'half_cheetah'

    def __init__(self, task='cripple', reset_every_episode=False,
                 cripple_set=None, **kw):
        """cripple_set: actuator ids the per-episode task distribution draws
        from (default 1..5, the reference's distribution — bthigh/actuator 0
        is never crippled, half_cheetah_env.py:77). The meta-test protocol
        trains with one actuator held out (e.g. (1,2,3,5)) and evaluates on
        the holdout ((4,)) — the cheetah analog of the Ant leg-3 split."""
        from learning_to_adapt_tpu.utils.serializable import Serializable
        Serializable.quick_init(self, locals())
        # set before super().__init__: obs-shape inference traces reset()
        # -> sample_task. 1..5 = all actuators but bthigh (6 is the cheetah
        # asset's actuator count, asserted below).
        self.cripple_set = (tuple(int(a) for a in cripple_set)
                            if cripple_set is not None
                            else tuple(range(1, 6)))
        super().__init__(task=task, reset_every_episode=reset_every_episode,
                         **kw)
        assert all(1 <= a < self.act_dim for a in self.cripple_set) \
            and self.cripple_set
        assert self.task in (None, 'cripple')

    def _build_model(self):
        return get_model('half_cheetah')

    def observe(self, data, phys):
        return jnp.concatenate([
            phys.qpos[1:], phys.qvel,
            self.body_com(data, 'torso')])

    def step_reward(self, data, action):
        ctrl_cost = 1e-1 * 0.5 * jnp.sum(jnp.square(action))
        return self.body_comvel(data, 'torso')[0] - ctrl_cost

    def reward(self, obs, act, next_obs):
        ctrl_cost = 1e-1 * 0.5 * jnp.sum(jnp.square(act), axis=-1)
        forward = (next_obs[..., -3] - obs[..., -3]) / self.dt
        return forward - ctrl_cost

    def sample_task(self, key, mm, task):
        acts = jnp.asarray(self.cripple_set, jnp.int32)
        crippled = acts[jax.random.randint(key, (), 0,
                                           len(self.cripple_set))]
        mask = jnp.ones(self.act_dim, self.dtype).at[crippled].set(0.0)
        return mm, dict(task, cripple_mask=mask)


class HalfCheetahHFieldEnv(HalfCheetahEnv):
    """Cheetah on procedural terrain. Tasks regenerate the heightfield
    profile per episode (reference half_cheetah_hfield_env.py:76-166)."""

    name = 'half_cheetah_hfield'

    #: named terrain profiles (reference half_cheetah_hfield_env.py:76-166
    #: regenerates these same variants by mutating model.hfield_data)
    NAMED_TERRAINS = ('basin', 'hill', 'gentle', 'steep')

    def __init__(self, task='hfield', reset_every_episode=False,
                 terrain_set=None, **kw):
        """terrain_set: named terrain variants the per-episode task
        distribution draws from (uniformly), e.g. ('gentle', 'hill'). The
        continuous-OOD meta-test protocol trains on a subset of the named
        terrains and evaluates on the held-out ones (('steep',),
        ('basin',)) — the terrain analog of the Ant leg-3 split. None
        (default) keeps the single-task behavior selected by `task`."""
        from learning_to_adapt_tpu.utils.serializable import Serializable
        Serializable.quick_init(self, locals())
        self.terrain_set = (tuple(str(t) for t in terrain_set)
                            if terrain_set is not None else None)
        # validate before super().__init__: obs-shape inference traces
        # reset() -> sample_task, which indexes the named-profile table
        if self.terrain_set is not None:
            assert self.terrain_set and all(
                t in self.NAMED_TERRAINS for t in self.terrain_set), \
                f'terrain_set members must be in {self.NAMED_TERRAINS}'
        TPUEnv.__init__(self, task=task,
                        reset_every_episode=reset_every_episode, **kw)
        assert self.task in (None, 'hfield', 'hill', 'basin', 'steep',
                             'gentle')

    def _build_model(self):
        return get_model('half_cheetah_hfield')

    def _profile(self, x_walls, height_walls, width, ncol=500):
        """row[x] = sum_i h_i * clip(x - x_i + 1, 0, width): each wall is a
        linear ramp of `width` cells then a plateau — the closed form of the
        reference's cumsum-and-propagate loop."""
        xs = jnp.arange(ncol, dtype=self.dtype)
        ramp = jnp.clip(xs[None, :] - x_walls[:, None] + 1.0, 0.0, width)
        row = jnp.sum(height_walls[:, None] * ramp, axis=0)
        row = (row - row.min()) / (row.max() - row.min() + 1e-12)
        return row

    def _named_profile(self, name):
        """(row, size) for a fixed named terrain variant."""
        fixed = {
            'basin': ([-1., 1., 0., 0., 0., 0.], 0.55),
            'hill': ([1., -1., 0., 0., 0., 0.], 0.6),
            'gentle': ([1., 1., 1., 1., 1., 1.], 1.0),
            'steep': ([1., 1., 1., 1., 1., 1.], 4.0),
        }[name]
        walls = jnp.asarray([250., 265., 280., 295., 310., 325.],
                            self.dtype)
        h = jnp.asarray(fixed[0], self.dtype)
        row = self._profile(walls, h, 15.0)
        size = jnp.asarray([50., 5., fixed[1], 0.1], self.dtype)
        return row, size

    def sample_task(self, key, mm, task):
        if self.terrain_set is not None:
            # per-episode uniform draw among the named variants: the
            # profiles are compile-time constants, so the task sample is
            # one traced index into a stacked table
            rows, sizes = zip(*(self._named_profile(n)
                                for n in self.terrain_set))
            i = jax.random.randint(key, (), 0, len(self.terrain_set))
            return dataclasses.replace(
                mm, hfield_row=jnp.stack(rows)[i],
                hfield_size=jnp.stack(sizes)[i]), task
        if self.task == 'hfield':
            k1, k2, k3 = jax.random.split(key, 3)
            height = jax.random.uniform(k1, (), self.dtype, 0.2, 1.0)
            # choice without replacement from arange(255, 310, 10) == a
            # permutation of its 6 elements
            walls = jnp.asarray([255., 265., 275., 285., 295., 305.],
                                self.dtype)
            walls = jax.random.permutation(k2, walls)
            k3a, k3b = jax.random.split(k3)
            sign = jnp.where(jax.random.bernoulli(k3a, 0.5, (6,)), 1.0, -1.0)
            sign = sign.at[:2].set(1.0)
            h = jax.random.uniform(k3b, (6,), self.dtype, 0.2, 0.6) * sign
            row = self._profile(walls, h, 10.0)
            size = jnp.asarray([50., 5., 0., 0.1], self.dtype).at[2].set(height)
        else:
            row, size = self._named_profile(self.task)
        return dataclasses.replace(mm, hfield_row=row, hfield_size=size), task


class HalfCheetahBlocksEnv(HalfCheetahEnv):
    """Cheetah on 8 spring-loaded blocks; obs drops the block dofs
    (reference half_cheetah_blocks_env.py:31-36: qpos[9:], qvel[8:]).
    task 'damping': dof_damping[:8] ~ U(0,10)."""

    name = 'half_cheetah_blocks'

    def __init__(self, task='damping', reset_every_episode=False,
                 damping_range=(0.0, 10.0), **kw):
        """damping_range: (lo, hi) of the per-episode uniform block-damping
        draw (reference half_cheetah_blocks_env.py:72-84 hard-codes
        U(0,10)). The continuous-OOD meta-test protocol trains on the
        default range and evaluates on an extrapolated one, e.g.
        (12, 20)."""
        from learning_to_adapt_tpu.utils.serializable import Serializable
        Serializable.quick_init(self, locals())
        self.damping_range = (float(damping_range[0]),
                              float(damping_range[1]))
        assert self.damping_range[0] <= self.damping_range[1]
        TPUEnv.__init__(self, task=task,
                        reset_every_episode=reset_every_episode, **kw)
        assert self.task in (None, 'damping')

    def _build_model(self):
        return get_model('half_cheetah_blocks')

    def observe(self, data, phys):
        return jnp.concatenate([
            phys.qpos[9:], phys.qvel[8:],
            self.body_com(data, 'torso')])

    def sample_task(self, key, mm, task):
        lo, hi = self.damping_range
        damp = jax.random.uniform(key, (8,), self.dtype, lo, hi)
        return dataclasses.replace(
            mm, dof_damping=mm.dof_damping.at[:8].set(damp)), task
