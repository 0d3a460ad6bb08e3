"""End-to-end smoke tests: 2 training iterations of each algorithm
(MB-MPC / GrBAL / ReBAL) on HalfCheetah with tiny planner/path sizes.
Exercises the full fused pipeline: reset -> adapt -> plan -> physics ->
process -> fit."""
import numpy as np
import pytest

from learning_to_adapt_tpu.envs import HalfCheetahEnv, normalize
from learning_to_adapt_tpu.models import (
    MetaMLPDynamicsModel, MLPDynamicsModel, RNNDynamicsModel)
from learning_to_adapt_tpu.policies import MPCController, RNNMPCController
from learning_to_adapt_tpu.samplers import ModelSampleProcessor, Sampler
from learning_to_adapt_tpu.trainers import Trainer

N_ROLLOUTS = 2
PATH_LEN = 30


def _run(policy_cls, model, recurrent, adapt_batch_size=None, use_cem=False):
    env = model_env
    policy = policy_cls('policy', env, model, n_candidates=8, horizon=3,
                        use_cem=use_cem, num_cem_iters=2)
    sampler = Sampler(env=env, policy=policy, num_rollouts=N_ROLLOUTS,
                      max_path_length=PATH_LEN,
                      adapt_batch_size=adapt_batch_size)
    proc = ModelSampleProcessor(recurrent=recurrent)
    algo = Trainer(env=env, policy=policy, dynamics_model=model,
                   sampler=sampler, sample_processor=proc, n_itr=2,
                   initial_random_samples=True,
                   dynamics_model_max_epochs=3)
    algo.train()
    return sampler


model_env = normalize(HalfCheetahEnv(task=None, reset_every_episode=True))


def test_mb_mpc_end_to_end():
    model = MLPDynamicsModel('dyn', model_env, hidden_sizes=(32,),
                             batch_size=16)
    sampler = _run(MPCController, model, recurrent=False)
    assert sampler.total_timesteps_sampled == 2 * N_ROLLOUTS * PATH_LEN


def test_grbal_end_to_end():
    model = MetaMLPDynamicsModel('dyn', model_env, hidden_sizes=(32,),
                                 meta_batch_size=3, batch_size=4,
                                 inner_learning_rate=0.01)
    sampler = _run(MPCController, model, recurrent=True, adapt_batch_size=4)
    assert sampler.total_timesteps_sampled == 2 * N_ROLLOUTS * PATH_LEN


def test_rebal_end_to_end():
    model = RNNDynamicsModel('dyn', model_env, hidden_sizes=(16,),
                             cell_type='lstm', batch_size=2,
                             backprop_steps=10)
    sampler = _run(RNNMPCController, model, recurrent=True)
    assert sampler.total_timesteps_sampled == 2 * N_ROLLOUTS * PATH_LEN


def test_mb_mpc_cem_end_to_end():
    model = MLPDynamicsModel('dyn', model_env, hidden_sizes=(32,),
                             batch_size=16)
    _run(MPCController, model, recurrent=False, use_cem=True)


def test_paths_shapes_and_finiteness():
    model = MLPDynamicsModel('dyn', model_env, hidden_sizes=(32,),
                             batch_size=16)
    policy = MPCController('policy', model_env, model, n_candidates=8,
                           horizon=3)
    sampler = Sampler(env=model_env, policy=policy, num_rollouts=N_ROLLOUTS,
                      max_path_length=PATH_LEN)
    paths = sampler.obtain_samples(random=True)
    assert paths['observations'].shape == (N_ROLLOUTS, PATH_LEN, 20)
    assert paths['actions'].shape == (N_ROLLOUTS, PATH_LEN, 6)
    assert paths['rewards'].shape == (N_ROLLOUTS, PATH_LEN)
    for v in paths.values():
        assert np.isfinite(np.asarray(v)).all()
    # observations chain: next_observations[t] == observations[t+1]
    np.testing.assert_allclose(paths['next_observations'][:, :-1],
                               paths['observations'][:, 1:], rtol=1e-5)
