"""End-to-end replay + profiling coverage (L7/L8):

tiny training run -> snapshot on disk -> sim_policy.load_experiment ->
fused replay -> render_trajectory PNG, plus --profile trace capture.
Exercises the Serializable env round-trip and the jax.profiler wiring in
one pipeline (reference analog: experiment_utils/sim_policy.py:9-39 +
samplers/utils.py rollout)."""
import importlib.util
import json
import os
import sys

import numpy as np

from learning_to_adapt_tpu.envs import HalfCheetahEnv, normalize
from learning_to_adapt_tpu.models import MLPDynamicsModel
from learning_to_adapt_tpu.policies import MPCController
from learning_to_adapt_tpu.samplers import ModelSampleProcessor, Sampler
from learning_to_adapt_tpu.trainers import Trainer
from learning_to_adapt_tpu.utils import logging as logger

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_module(relpath, name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_REPO, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_train_snapshot_replay_render_profile(tmp_path):
    exp_dir = str(tmp_path / 'exp')
    profile_dir = os.path.join(exp_dir, 'profile')
    logger.configure(dir=exp_dir, format_strs=['csv'], snapshot_mode='last')
    config = dict(n_candidates=8, horizon=3, hidden_sizes=(32,),
                  batch_size=16, discount=1.0, use_cem=False)
    with open(os.path.join(exp_dir, 'params.json'), 'w') as f:
        json.dump({k: list(v) if isinstance(v, tuple) else v
                   for k, v in config.items()}, f)

    env = normalize(HalfCheetahEnv(task=None, reset_every_episode=True))
    model = MLPDynamicsModel('dyn_model', env, hidden_sizes=(32,),
                             batch_size=16)
    policy = MPCController('policy', env, model, n_candidates=8, horizon=3)
    sampler = Sampler(env=env, policy=policy, num_rollouts=2,
                      max_path_length=30)
    trainer = Trainer(env=env, policy=policy, dynamics_model=model,
                      sampler=sampler,
                      sample_processor=ModelSampleProcessor(recurrent=False),
                      n_itr=2, initial_random_samples=True,
                      dynamics_model_max_epochs=3, profile_dir=profile_dir)
    trainer.train()

    # --- profiling: device traces captured for sampling and fit ---
    for sub in ('sampling', 'fit'):
        d = os.path.join(profile_dir, sub)
        assert os.path.isdir(d), f'missing trace dir {d}'
        files = [os.path.join(dp, f) for dp, _, fs in os.walk(d) for f in fs]
        assert files, f'no trace files under {d}'

    # --- snapshot -> replay (the sim_policy surface) ---
    assert os.path.exists(os.path.join(exp_dir, 'params.pkl'))
    sim_policy = _load_module('experiment_utils/sim_policy.py', 'sim_policy')
    env2, model2, policy2, cfg2, adapt_bs = sim_policy.load_experiment(
        exp_dir)
    # Serializable round trip preserved the env config
    assert env2.wrapped_env.task is None
    np.testing.assert_allclose(
        np.asarray(jax_leaves_sum(model2.params)),
        np.asarray(jax_leaves_sum(model.params)), rtol=1e-6)
    paths = sim_policy.rollout(env2, policy2, model2, max_path_length=20,
                               num_rollouts=2, adapt_batch_size=adapt_bs)
    assert paths['rewards'].shape == (2, 20)
    assert np.isfinite(paths['rewards']).all()
    npz = os.path.join(exp_dir, 'replay.npz')
    np.savez_compressed(npz, **paths)

    # --- offline renderer on the replayed trajectory ---
    render = _load_module('tools/render_trajectory.py', 'render_trajectory')
    argv = sys.argv
    try:
        sys.argv = ['render_trajectory.py', npz, '--env', 'half_cheetah',
                    '--stride', '10']
        render.main()
    finally:
        sys.argv = argv
    out = npz.replace('.npz', '.png')
    assert os.path.exists(out) and os.path.getsize(out) > 0


def jax_leaves_sum(tree):
    import jax
    return sum(float(np.abs(np.asarray(x)).sum())
               for x in jax.tree.leaves(tree))
