"""Environment-level tests: obs dims, stepping, task sampling, batching.

Obs dims must match the reference exactly (planner rewards index obs[:,-3]):
cheetah 20, hfield 20, blocks 20, ant 41, arm 23 (SURVEY.md section 2.3).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from learning_to_adapt_tpu.envs import (
    AntEnv, Arm7DofEnv, HalfCheetahBlocksEnv, HalfCheetahEnv,
    HalfCheetahHFieldEnv, normalize)

ENVS = [
    (HalfCheetahEnv, 'cripple', 20),
    (HalfCheetahHFieldEnv, 'hfield', 20),
    (HalfCheetahBlocksEnv, 'damping', 20),
    (AntEnv, 'cripple', 41),
    (Arm7DofEnv, 'force', 23),
]


@pytest.mark.parametrize('cls,task,obs_dim', ENVS,
                         ids=[c.__name__ for c, _, _ in ENVS])
class TestEnv:
    def test_obs_dim_and_step(self, cls, task, obs_dim):
        env = cls(task=task, reset_every_episode=True)
        assert env.obs_dim == obs_dim
        key = jax.random.PRNGKey(0)
        state = jax.jit(env.reset)(key)
        assert state.obs.shape == (obs_dim,)
        act = jnp.zeros(env.act_dim)
        stepf = jax.jit(env.step)
        state, obs, reward, done, _ = stepf(state, act)
        assert obs.shape == (obs_dim,)
        assert np.isfinite(np.asarray(obs)).all()
        assert np.isfinite(float(reward))
        assert not bool(done)
        # a few more steps stay finite
        for _ in range(5):
            state, obs, reward, done, _ = stepf(state, act)
        assert np.isfinite(np.asarray(obs)).all()

    def test_task_resample_changes_dynamics(self, cls, task, obs_dim):
        env = cls(task=task, reset_every_episode=True)
        keys = jax.random.split(jax.random.PRNGKey(1), 6)
        # episode_idx > 0 -> task sampled; different keys should eventually
        # give different task pytrees
        states = [env.reset(k, episode_idx=1) for k in keys]
        flat = [np.concatenate([np.ravel(x) for x in jax.tree.leaves(
            (s.mm, s.task))]) for s in states]
        assert any(not np.allclose(flat[0], f) for f in flat[1:])

    def test_first_episode_is_nominal(self, cls, task, obs_dim):
        env = cls(task=task, reset_every_episode=True)
        s0 = env.reset(jax.random.PRNGKey(2), episode_idx=0)
        nominal_mm = jax.tree.leaves(env.mm0)
        for a, b in zip(jax.tree.leaves(s0.mm), nominal_mm):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        np.testing.assert_allclose(np.asarray(s0.task['cripple_mask']), 1.0)

    def test_vmap_batch(self, cls, task, obs_dim):
        env = cls(task=task, reset_every_episode=True)
        keys = jax.random.split(jax.random.PRNGKey(3), 4)
        states = jax.jit(jax.vmap(lambda k: env.reset(k, 1)))(keys)
        acts = jnp.zeros((4, env.act_dim))
        out = jax.jit(jax.vmap(env.step))(states, acts)
        assert out[1].shape == (4, obs_dim)
        assert np.isfinite(np.asarray(out[1])).all()

    def test_planner_reward_batched(self, cls, task, obs_dim):
        env = cls(task=task)
        obs = jnp.zeros((7, obs_dim))
        nobs = jnp.ones((7, obs_dim))
        act = jnp.zeros((7, env.act_dim))
        r = env.reward(obs, act, nobs)
        assert r.shape == (7,)


class TestCheetahPhysicsSanity:
    def test_cheetah_stands_under_zero_action(self):
        env = HalfCheetahEnv(task=None)
        state = env.reset(jax.random.PRNGKey(0))
        stepf = jax.jit(env.step)
        act = jnp.zeros(env.act_dim)
        for _ in range(50):
            state, obs, reward, done, _ = stepf(state, act)
        # torso z (qpos[1] is rootz slot in obs[0]? obs=[qpos1:] so obs[0]
        # is rootz) should stay in a sane band: not fallen through the floor,
        # not launched
        rootz = float(state.phys.qpos[1])
        assert -0.5 < rootz < 1.0
        assert np.isfinite(np.asarray(state.phys.qvel)).all()

    def test_forward_torque_moves_forward_eventually(self):
        env = HalfCheetahEnv(task=None)
        state = env.reset(jax.random.PRNGKey(0))
        stepf = jax.jit(env.step)
        key = jax.random.PRNGKey(42)
        x0 = float(state.phys.qpos[0])
        for i in range(100):
            key, sub = jax.random.split(key)
            act = jax.random.uniform(sub, (env.act_dim,), minval=-1.,
                                     maxval=1.)
            state, *_ = stepf(state, act)
        # random actions should not teleport the cheetah
        assert abs(float(state.phys.qpos[0]) - x0) < 5.0
        assert np.isfinite(np.asarray(state.phys.qpos)).all()


class TestInstabilityRecovery:
    def test_extreme_velocities_never_nan(self):
        """MPC exploitation can drive the solver into divergence; env.step
        must recover (pre-step pose, zeroed qvel) instead of emitting
        non-finite observations that poison rollout datasets."""
        import dataclasses
        env = HalfCheetahEnv(task=None)
        keys = jax.random.split(jax.random.PRNGKey(0), 8)
        states = jax.jit(jax.vmap(env.reset))(keys)
        qvel = jax.random.uniform(jax.random.PRNGKey(1), (8, 9),
                                  minval=-150., maxval=150.)
        states = dataclasses.replace(
            states, phys=dataclasses.replace(states.phys, qvel=qvel))
        stepf = jax.jit(jax.vmap(env.step))
        key = jax.random.PRNGKey(2)
        for _ in range(30):
            key, sub = jax.random.split(key)
            acts = jax.random.uniform(sub, (8, 6), minval=-1., maxval=1.)
            states, obs, r, d, _ = stepf(states, acts)
            assert np.isfinite(np.asarray(obs)).all()
            assert np.isfinite(np.asarray(r)).all()


class TestNormalizedEnv:
    def test_action_rescale(self):
        env = normalize(AntEnv(task=None))
        lo, hi = env.wrapped_env.action_space_bounds
        a = jnp.ones(env.act_dim)
        denorm = env.denormalize_action(a)
        np.testing.assert_allclose(np.asarray(denorm), np.asarray(hi))
        denorm = env.denormalize_action(-a)
        np.testing.assert_allclose(np.asarray(denorm), np.asarray(lo))
