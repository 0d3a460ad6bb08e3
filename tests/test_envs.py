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


class TestHostSurface:
    """Round-2 coverage for the host-facing surfaces VERDICT round 1
    flagged as dead: running normalization, action noise, Serializable
    pickling, and the instability-recovery flag."""

    def test_maybe_normalize_through_executor(self):
        from learning_to_adapt_tpu.envs import HalfCheetahEnv, NormalizedEnv
        from learning_to_adapt_tpu.samplers.vectorized_env_executor import (
            IterativeEnvExecutor)
        env = NormalizedEnv(HalfCheetahEnv(task=None), normalize_obs=True,
                            normalize_reward=True)
        ex = IterativeEnvExecutor(env, num_rollouts=2, max_path_length=8,
                                  seed=0)
        ex.reset()
        a = np.zeros((2, env.act_dim), np.float32)
        obs1, rew1, _, _ = ex.step(a)
        # the running estimator saw 2 observations -> mean/var moved
        assert np.any(env._obs_mean != 0.0)
        assert env._reward_var != 1.0 or env._reward_mean != 0.0
        # normalized outputs differ from the raw device observations
        raw = NormalizedEnv(HalfCheetahEnv(task=None))
        ex_raw = IterativeEnvExecutor(raw, num_rollouts=2, max_path_length=8,
                                      seed=0)
        ex_raw.reset()
        obs_raw, rew_raw, _, _ = ex_raw.step(a)
        assert not np.allclose(obs1, obs_raw)

    def test_action_noise_perturbs_trajectory(self):
        from learning_to_adapt_tpu.envs import HalfCheetahEnv
        quiet = HalfCheetahEnv(task=None)
        noisy = HalfCheetahEnv(task=None, action_noise=0.5)
        s_q = quiet.reset(jax.random.PRNGKey(0))
        s_n = noisy.reset(jax.random.PRNGKey(0))
        a = jnp.zeros(quiet.act_dim)
        _, o_q, _, _, _ = quiet.step(s_q, a)
        _, o_n, _, _, _ = noisy.step(s_n, a)
        assert not np.allclose(np.asarray(o_q), np.asarray(o_n))
        # zero-noise env is deterministic given the same state
        _, o_q2, _, _, _ = quiet.step(s_q, a)
        np.testing.assert_allclose(np.asarray(o_q), np.asarray(o_q2))

    def test_serializable_env_roundtrip(self):
        import pickle
        from learning_to_adapt_tpu.envs import AntEnv, normalize
        env = normalize(AntEnv(task='cripple', reset_every_episode=True))
        env2 = pickle.loads(pickle.dumps(env))
        assert env2.wrapped_env.task == 'cripple'
        assert env2.wrapped_env.reset_every_episode
        assert env2.wrapped_env.obs_dim == env.wrapped_env.obs_dim
        # clone-with-override (reference Serializable.clone)
        from learning_to_adapt_tpu.utils.serializable import Serializable
        env3 = Serializable.clone(env.wrapped_env, task=None)
        assert env3.task is None

    def test_instability_recovery_flag(self):
        from learning_to_adapt_tpu.envs import HalfCheetahEnv
        import dataclasses
        from learning_to_adapt_tpu.physics import engine
        env_on = HalfCheetahEnv(task=None)
        env_off = HalfCheetahEnv(task=None, instability_recovery=False)
        s = env_on.reset(jax.random.PRNGKey(0))
        # inject a diverged velocity state
        bad_phys = engine.PhysicsState(
            qpos=s.phys.qpos, qvel=jnp.full_like(s.phys.qvel, 500.0))
        s_bad = dataclasses.replace(s, phys=bad_phys)
        a = jnp.zeros(env_on.act_dim)
        s2_on, _, _, _, _ = env_on.step(s_bad, a)
        s2_off, _, _, _, _ = env_off.step(s_bad, a)
        # recovery clamps velocity to zero + pre-step pose; raw mode doesn't
        assert float(jnp.max(jnp.abs(s2_on.phys.qvel))) == 0.0
        assert float(jnp.max(jnp.abs(s2_off.phys.qvel))) > 100.0


class TestCrippleHoldout:
    """Meta-test train/holdout splits (reference ant_env.py:105-106: leg 3
    is reserved for meta-test; the cheetah analog holds out one actuator)."""

    def _sampled_zeros(self, env, n=64):
        """Actuator indices zeroed by n task draws."""
        zeros = set()
        for i in range(n):
            _, task = env.sample_task(jax.random.PRNGKey(i), env.mm0,
                                      env.default_task())
            idx = np.where(np.asarray(task['cripple_mask']) == 0.0)[0]
            zeros.update(int(j) for j in idx)
        return zeros

    def test_ant_default_never_cripples_leg3(self):
        from learning_to_adapt_tpu.envs.ant import _ACT_PAIRS
        env = AntEnv(task='cripple', reset_every_episode=True)
        assert env.cripple_set == (0, 1, 2)
        zeros = self._sampled_zeros(env)
        leg3 = set(_ACT_PAIRS[3])
        assert not (zeros & leg3), 'train distribution touched holdout leg 3'
        # all three train legs appear
        for leg in (0, 1, 2):
            assert set(_ACT_PAIRS[leg]) <= zeros

    def test_ant_eval_set_cripples_only_leg3(self):
        from learning_to_adapt_tpu.envs.ant import _ACT_PAIRS
        env = AntEnv(task='cripple', reset_every_episode=True,
                     cripple_set=(3,))
        zeros = self._sampled_zeros(env, n=8)
        assert zeros == set(_ACT_PAIRS[3])

    def test_cheetah_holdout_split(self):
        train = HalfCheetahEnv(task='cripple', reset_every_episode=True,
                               cripple_set=(1, 2, 3, 5))
        assert self._sampled_zeros(train) == {1, 2, 3, 5}
        hold = HalfCheetahEnv(task='cripple', reset_every_episode=True,
                              cripple_set=(4,))
        assert self._sampled_zeros(hold, n=8) == {4}
        # default distribution unchanged: 1..5
        dflt = HalfCheetahEnv(task='cripple', reset_every_episode=True)
        assert dflt.cripple_set == (1, 2, 3, 4, 5)

    def test_cripple_set_survives_serializable_roundtrip(self):
        import pickle
        env = AntEnv(task='cripple', reset_every_episode=True,
                     cripple_set=(3,))
        env2 = pickle.loads(pickle.dumps(env))
        assert env2.cripple_set == (3,)
        env3 = HalfCheetahEnv(task='cripple', cripple_set=(1, 2, 3, 5))
        env4 = pickle.loads(pickle.dumps(env3))
        assert env4.cripple_set == (1, 2, 3, 5)
