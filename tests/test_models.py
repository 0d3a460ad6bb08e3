"""Dynamics-model unit tests: learning on synthetic linear dynamics,
MAML adaptation improving post-update loss, RNN TBPTT shapes/finiteness."""
import jax
import jax.numpy as jnp
import numpy as np

from learning_to_adapt_tpu.models import (
    MetaMLPDynamicsModel, MLPDynamicsModel, RNNDynamicsModel)


class FakeEnv:
    def __init__(self, obs_dim=4, act_dim=2):
        self.obs_dim = obs_dim
        self.act_dim = act_dim


def linear_system(key, n, obs_dim=4, act_dim=2, a_scale=0.9, seed_mat=7):
    rng = np.random.RandomState(seed_mat)
    A = np.eye(obs_dim) * a_scale + rng.randn(obs_dim, obs_dim) * 0.01
    B = rng.randn(obs_dim, act_dim) * 0.1
    obs = np.asarray(jax.random.normal(key, (n, obs_dim)))
    act = np.asarray(jax.random.normal(jax.random.fold_in(key, 1),
                                       (n, act_dim)))
    nxt = obs @ A.T + act @ B.T
    return obs.astype(np.float32), act.astype(np.float32), \
        nxt.astype(np.float32)


class TestMLP:
    def test_learns_linear_dynamics(self):
        env = FakeEnv()
        model = MLPDynamicsModel('dyn', env, hidden_sizes=(64, 64),
                                 batch_size=128, learning_rate=1e-3)
        obs, act, nxt = linear_system(jax.random.PRNGKey(0), 4096)
        model.fit(obs, act, nxt, epochs=30)
        o2, a2, n2 = linear_system(jax.random.PRNGKey(5), 256)
        pred = model.predict(o2, a2)
        mse = float(np.mean((pred - n2) ** 2))
        base = float(np.mean((o2 - n2) ** 2))  # identity baseline
        assert mse < base * 0.2, (mse, base)

    def test_growing_dataset_and_recompile_stability(self):
        env = FakeEnv()
        model = MLPDynamicsModel('dyn', env, hidden_sizes=(32,),
                                 batch_size=64)
        for i in range(3):
            obs, act, nxt = linear_system(jax.random.PRNGKey(i), 512)
            out = model.fit(obs, act, nxt, epochs=3)
            assert np.isfinite(out['train_loss'])

    def test_ensemble(self):
        env = FakeEnv()
        model = MLPDynamicsModel('dyn', env, hidden_sizes=(32,), n_members=4,
                                 batch_size=64)
        obs, act, nxt = linear_system(jax.random.PRNGKey(0), 512)
        model.fit(obs, act, nxt, epochs=3)
        pred = model.predict(obs[:16], act[:16])
        assert pred.shape == (16, 4)
        assert np.isfinite(pred).all()


class TestOnRealDynamics:
    def test_mlp_learns_cheetah_dynamics(self):
        """The model pipeline (normalization, delta targets, fit loop) must
        beat the persistence baseline on real physics transitions."""
        import jax
        from learning_to_adapt_tpu.envs import HalfCheetahEnv, normalize
        from learning_to_adapt_tpu.models import MLPDynamicsModel
        from learning_to_adapt_tpu.policies import MPCController
        from learning_to_adapt_tpu.samplers import Sampler
        env = normalize(HalfCheetahEnv(task=None))
        model = MLPDynamicsModel('dyn', env, hidden_sizes=(128, 128),
                                 batch_size=128)
        policy = MPCController('p', env, model, n_candidates=4, horizon=2)
        sampler = Sampler(env=env, policy=policy, num_rollouts=8,
                          max_path_length=100, seed=1)
        paths = sampler.obtain_samples(random=True)
        obs = paths['observations'].reshape(-1, env.obs_dim)
        act = paths['actions'].reshape(-1, env.act_dim)
        nxt = paths['next_observations'].reshape(-1, env.obs_dim)
        tr = slice(0, 700)
        te = slice(700, 800)
        model.fit(obs[tr], act[tr], nxt[tr], epochs=40)
        pred = model.predict(obs[te], act[te])
        mse = float(np.mean((pred - nxt[te]) ** 2))
        persistence = float(np.mean((obs[te] - nxt[te]) ** 2))
        assert mse < persistence * 0.5, (mse, persistence)


class TestMetaMLP:
    def _multitask_paths(self, n_paths=8, t_len=64, obs_dim=4, act_dim=2):
        """Each path has its own dynamics (A scaled differently) — the task
        distribution MAML should adapt across."""
        rng = np.random.RandomState(0)
        obs = np.zeros((n_paths, t_len, obs_dim), np.float32)
        act = rng.randn(n_paths, t_len, act_dim).astype(np.float32)
        nxt = np.zeros_like(obs)
        for p in range(n_paths):
            scale = 0.5 + p * 0.1
            A = np.eye(obs_dim) * scale
            B = rng.randn(obs_dim, act_dim) * 0.1
            o = rng.randn(obs_dim)
            for t in range(t_len):
                obs[p, t] = o
                o = A @ o + B @ act[p, t]
                nxt[p, t] = o
        return obs, act, nxt

    def test_fit_and_adapt(self):
        env = FakeEnv()
        model = MetaMLPDynamicsModel('meta', env, hidden_sizes=(64, 64),
                                     meta_batch_size=4, batch_size=8,
                                     inner_learning_rate=0.01,
                                     learning_rate=1e-3)
        obs, act, nxt = self._multitask_paths()
        out = model.fit(obs, act, nxt, epochs=10)
        assert np.isfinite(out['post_loss'])

        # adaptation on a window must change predictions
        w_obs, w_act, w_nxt = obs[:2, :8], act[:2, :8], nxt[:2, :8]
        pred_before = model.predict(obs[0, :8], act[0, :8])
        model.adapt(list(w_obs), list(w_act), list(w_nxt))
        assert model.adapted
        pred_after = model.predict(
            np.tile(obs[0, :8], (2, 1))[:16].reshape(16, -1)[:16],
            np.tile(act[0, :8], (2, 1))[:16].reshape(16, -1)[:16])
        assert pred_after.shape[0] == 16
        model.switch_to_pre_adapt()
        assert not model.adapted
        pred_restored = model.predict(obs[0, :8], act[0, :8])
        np.testing.assert_allclose(pred_before, pred_restored, rtol=1e-5)

    def test_inner_step_reduces_task_loss(self):
        env = FakeEnv()
        model = MetaMLPDynamicsModel('meta', env, hidden_sizes=(32,),
                                     inner_learning_rate=0.05)
        obs, act, nxt = self._multitask_paths(n_paths=2, t_len=32)
        o = jnp.asarray(obs[0])
        a = jnp.asarray(act[0])
        d = jnp.asarray(nxt[0] - obs[0])
        norm = model.normalizer
        on, an, dn = norm.norm_obs(o), norm.norm_act(a), norm.norm_delta(d)
        loss0 = float(model._mse(model.params, on, an, dn))
        adapted = model.inner_step_fn(model.params, on, an, dn)
        loss1 = float(model._mse(adapted, on, an, dn))
        assert loss1 < loss0


class TestRNN:
    def test_fit_and_predict(self):
        env = FakeEnv()
        model = RNNDynamicsModel('rnn', env, hidden_sizes=(32,),
                                 cell_type='lstm', batch_size=4,
                                 backprop_steps=16)
        rng = np.random.RandomState(0)
        obs = rng.randn(8, 64, 4).astype(np.float32)
        act = rng.randn(8, 64, 2).astype(np.float32)
        nxt = obs * 0.9
        out = model.fit(obs, act, nxt, epochs=3)
        assert np.isfinite(out['train_loss'])
        hidden = model.get_initial_hidden(5)
        pred, hidden2 = model.predict(obs[:5, 0], act[:5, 0], hidden)
        assert pred.shape == (5, 4)
        # hidden state changed
        h0 = jax.tree.leaves(hidden)[0]
        h2 = jax.tree.leaves(hidden2)[0]
        assert not np.allclose(np.asarray(h0), np.asarray(h2))

    def test_all_cell_types(self):
        for cell in ('lstm', 'gru', 'rnn'):
            env = FakeEnv()
            model = RNNDynamicsModel('rnn', env, hidden_sizes=(16,),
                                     cell_type=cell, batch_size=2,
                                     backprop_steps=8)
            rng = np.random.RandomState(1)
            obs = rng.randn(4, 16, 4).astype(np.float32)
            act = rng.randn(4, 16, 2).astype(np.float32)
            out = model.fit(obs, act, obs * 0.5, epochs=2)
            assert np.isfinite(out['train_loss'])
