"""Coverage for the BASELINE.json benchmark configurations beyond the
canonical GrBAL cheetah: f64 parity mode, CEM + ensemble MB-MPC, ReBAL on
Ant, ensemble sharding over the 'model' mesh axis."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestParityModeF64:
    def test_env_steps_in_float64(self):
        """Parity harness capability: the same env code runs in f64 on CPU
        (SURVEY.md 7.4 — trajectory checks at higher precision)."""
        old = jax.config.jax_enable_x64
        jax.config.update('jax_enable_x64', True)
        try:
            from learning_to_adapt_tpu.envs import HalfCheetahEnv
            env = HalfCheetahEnv(task=None, dtype=jnp.float64)
            s = env.reset(jax.random.PRNGKey(0))
            assert s.phys.qpos.dtype == jnp.float64
            s2, obs, r, d, _ = env.step(s, jnp.zeros(env.act_dim,
                                                     jnp.float64))
            assert obs.dtype == jnp.float64
            assert np.isfinite(np.asarray(obs)).all()
        finally:
            jax.config.update('jax_enable_x64', old)


class TestEnsembleConfig:
    def test_cem_ensemble_rollout(self):
        """BASELINE config #2: CEM planner over an NN-ensemble dynamics
        model (tiny sizes)."""
        from learning_to_adapt_tpu.envs import HalfCheetahEnv, normalize
        from learning_to_adapt_tpu.models import MLPDynamicsModel
        from learning_to_adapt_tpu.policies import MPCController
        from learning_to_adapt_tpu.samplers import Sampler
        env = normalize(HalfCheetahEnv(task=None))
        model = MLPDynamicsModel('dyn', env, hidden_sizes=(16,), n_members=3)
        policy = MPCController('p', env, model, n_candidates=8, horizon=2,
                               use_cem=True, num_cem_iters=2)
        sampler = Sampler(env=env, policy=policy, num_rollouts=2,
                          max_path_length=5)
        paths = sampler.obtain_samples()
        assert np.isfinite(paths['observations']).all()

    def test_ensemble_members_shard_over_model_axis(self):
        """Ensemble members (the EP-like axis) shard over mesh axis 'model':
        a per-member grad step runs with params sharded member-major."""
        if len(jax.devices()) < 8:
            pytest.skip('needs 8 virtual devices')
        import optax
        from jax.sharding import NamedSharding, PartitionSpec as P
        from learning_to_adapt_tpu.parallel.mesh import make_mesh
        from learning_to_adapt_tpu.models import core

        mesh = make_mesh(n_env=2, n_model=4)
        n_members = 4
        keys = jax.random.split(jax.random.PRNGKey(0), n_members)
        params = jax.vmap(lambda k: core.init_mlp(k, 4, (16,), 4))(keys)
        member_sharded = NamedSharding(mesh, P('model'))
        params = jax.tree.map(
            lambda x: jax.device_put(x, member_sharded), params)

        x = jnp.ones((32, 4))
        y = jnp.zeros((32, 4))

        def member_loss(p):
            return jnp.mean((core.mlp_forward(p, x) - y) ** 2)

        @jax.jit
        def step(params):
            losses, grads = jax.vmap(
                jax.value_and_grad(member_loss))(params)
            params = jax.tree.map(lambda p, g: p - 0.01 * g, params, grads)
            return params, losses

        with mesh:
            params2, losses = step(params)
        assert losses.shape == (n_members,)
        assert np.isfinite(np.asarray(losses)).all()
        # members evolved independently (different inits -> different losses)
        assert len(set(np.asarray(losses).round(8).tolist())) > 1


class TestRebalAnt:
    def test_rnn_mpc_on_ant(self):
        """BASELINE config #4: recurrent dynamics + MPC on the Ant crippled
        task (tiny sizes; RK4 + free-joint physics under the fused
        sampler)."""
        from learning_to_adapt_tpu.envs import AntEnv, normalize
        from learning_to_adapt_tpu.models import RNNDynamicsModel
        from learning_to_adapt_tpu.policies import RNNMPCController
        from learning_to_adapt_tpu.samplers import (
            ModelSampleProcessor, Sampler)
        env = normalize(AntEnv(task='cripple', reset_every_episode=True))
        model = RNNDynamicsModel('dyn', env, hidden_sizes=(16,),
                                 cell_type='lstm', batch_size=2,
                                 backprop_steps=4)
        policy = RNNMPCController('p', env, model, n_candidates=4, horizon=2)
        sampler = Sampler(env=env, policy=policy, num_rollouts=2,
                          max_path_length=8)
        paths = sampler.obtain_samples()
        assert paths['observations'].shape == (2, 8, 41)
        assert np.isfinite(paths['observations']).all()
        proc = ModelSampleProcessor(recurrent=True)
        samples = proc.process_samples(paths)
        out = model.fit(samples['observations'], samples['actions'],
                        samples['next_observations'], epochs=2)
        assert np.isfinite(out['train_loss'])
