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

    # --- interactive viewer export on the same trajectory ---
    viewer = _load_module('tools/interactive_viewer.py', 'interactive_viewer')
    html = viewer.export_html(npz, 'half_cheetah', stride=5)
    assert os.path.exists(html)
    page = open(html).read()
    import re
    payload = json.loads(re.search(r'const D = (\{.*?\});\n', page,
                                   re.S).group(1))
    assert len(payload['frames']) == len(payload['rewards']) == 4  # 20/5
    assert payload['frames'][0]['s'], 'no body segments serialized'
    for marker in ('requestAnimationFrame', 'onwheel', 'follow'):
        assert marker in page, f'viewer HTML missing {marker} control'


def jax_leaves_sum(tree):
    import jax
    return sum(float(np.abs(np.asarray(x)).sum())
               for x in jax.tree.leaves(tree))


def _tiny_trainer(exp_dir, n_itr, start_itr=0, resume=False, seed=0,
                  kind='mlp'):
    """Build a tiny MB-MPC ('mlp') or GrBAL ('meta') pipeline writing
    snapshots to exp_dir."""
    from learning_to_adapt_tpu.utils.checkpoint import resume_trainer
    logger.configure(dir=exp_dir, format_strs=['csv'], snapshot_mode='last')
    env = normalize(HalfCheetahEnv(task='cripple', reset_every_episode=True))
    adapt_bs = None
    if kind == 'meta':
        from learning_to_adapt_tpu.models import MetaMLPDynamicsModel
        model = MetaMLPDynamicsModel('dyn_model', env, hidden_sizes=(32,),
                                     meta_batch_size=4, batch_size=4,
                                     seed=seed)
        adapt_bs = 4
    else:
        model = MLPDynamicsModel('dyn_model', env, hidden_sizes=(32,),
                                 batch_size=16, seed=seed)
    policy = MPCController('policy', env, model, n_candidates=8, horizon=3)
    sampler = Sampler(env=env, policy=policy, num_rollouts=2,
                      max_path_length=30, seed=seed,
                      adapt_batch_size=adapt_bs)
    if resume:
        start_itr = resume_trainer(exp_dir, model, sampler)
    trainer = Trainer(env=env, policy=policy, dynamics_model=model,
                      sampler=sampler,
                      sample_processor=ModelSampleProcessor(
                          recurrent=(kind == 'meta')),
                      n_itr=n_itr, start_itr=start_itr,
                      initial_random_samples=True,
                      dynamics_model_max_epochs=3)
    return trainer, model, sampler


import pytest


@pytest.mark.parametrize('kind', ['mlp', 'meta'])
def test_resume_equivalence(tmp_path, kind):
    """train(4) == train(2) + resume(2): same dataset composition, same
    sampler task/reset stream, same final parameters (VERDICT round-3 weak
    #3 — a resumed run must not silently train on different data). Both
    the plain-MLP and the second-order meta (GrBAL) fit paths."""
    import jax
    import pickle

    # straight-through 4 iterations
    dir_a = str(tmp_path / 'straight')
    trainer_a, model_a, sampler_a = _tiny_trainer(dir_a, n_itr=4, kind=kind)
    trainer_a.train()

    # 2 iterations, then a fresh process-equivalent resume for 2 more
    dir_b = str(tmp_path / 'resumed')
    trainer_b1, _, _ = _tiny_trainer(dir_b, n_itr=2, kind=kind)
    trainer_b1.train()
    trainer_b2, model_b, sampler_b = _tiny_trainer(dir_b, n_itr=4,
                                                   resume=True, kind=kind)
    assert trainer_b2.start_itr == 2
    trainer_b2.train()

    # identical aggregated dataset composition (not just sizes)
    for k in ('obs', 'act', 'delta'):
        np.testing.assert_array_equal(model_a._train[k], model_b._train[k])
        np.testing.assert_array_equal(model_a._test[k], model_b._test[k])
    # identical sampler stream state
    np.testing.assert_array_equal(np.asarray(sampler_a._key),
                                  np.asarray(sampler_b._key))
    assert sampler_a._episode_idx == sampler_b._episode_idx
    assert (sampler_a.total_timesteps_sampled
            == sampler_b.total_timesteps_sampled)
    # identical final parameters (same ops in same order on one backend;
    # tolerance covers any compile-cache nondeterminism)
    for pa, pb in zip(jax.tree.leaves(model_a.params),
                      jax.tree.leaves(model_b.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-5, atol=1e-6)
    # the snapshot on disk carries data + sampler state for the NEXT resume
    snap = pickle.load(open(os.path.join(dir_b, 'params.pkl'), 'rb'))
    assert snap['sampler'] is not None
    assert snap['dynamics_model'].get('train') is not None


def test_meta_test_pipeline_on_holdout(tmp_path):
    """The complete meta-test path on CPU: train a tiny GrBAL on a cheetah
    cripple distribution with actuator 4 held out, snapshot, rebuild the
    env on the HELD-OUT set via load_experiment(env_override=...), and
    roll out adapted vs pre-update (benchmarks/meta_test.py's protocol,
    VERDICT round-3 next-step #1)."""
    import json

    from learning_to_adapt_tpu.models import MetaMLPDynamicsModel
    from learning_to_adapt_tpu.utils.serializable import Serializable

    exp_dir = str(tmp_path / 'exp')
    logger.configure(dir=exp_dir, format_strs=['csv'], snapshot_mode='last')
    config = dict(n_candidates=8, horizon=3, meta_batch_size=4,
                  inner_learning_rate=0.001, adapt_batch_size=4,
                  hidden_sizes_model=[32], discount=1.0, use_cem=False,
                  task='cripple')
    with open(os.path.join(exp_dir, 'params.json'), 'w') as f:
        json.dump(config, f)

    env = normalize(HalfCheetahEnv(task='cripple', reset_every_episode=True,
                                   cripple_set=(1, 2, 3, 5)))
    model = MetaMLPDynamicsModel('dyn_model', env, hidden_sizes=(32,),
                                 meta_batch_size=4, batch_size=4)
    policy = MPCController('policy', env, model, n_candidates=8, horizon=3)
    sampler = Sampler(env=env, policy=policy, num_rollouts=2,
                      max_path_length=24, adapt_batch_size=4)
    trainer = Trainer(env=env, policy=policy, dynamics_model=model,
                      sampler=sampler,
                      sample_processor=ModelSampleProcessor(recurrent=True),
                      n_itr=2, initial_random_samples=True,
                      dynamics_model_max_epochs=2)
    trainer.train()

    sim_policy = _load_module('experiment_utils/sim_policy.py', 'sim_policy')
    # rebuild on the held-out actuator — the meta-test env
    env1, _, _, _, _ = sim_policy.load_experiment(exp_dir)
    base = env1.wrapped_env
    assert base.cripple_set == (1, 2, 3, 5)
    from learning_to_adapt_tpu.envs import normalize as norm_fn
    eval_env = norm_fn(Serializable.clone(base, cripple_set=(4,)))
    env2, model2, policy2, cfg2, adapt_bs = sim_policy.load_experiment(
        exp_dir, env_override=eval_env)
    assert env2.wrapped_env.cripple_set == (4,)
    assert adapt_bs == 4
    for bs in (adapt_bs, None):  # adapted vs pre-update
        paths = sim_policy.rollout(env2, policy2, model2,
                                   max_path_length=16, num_rollouts=2,
                                   adapt_batch_size=bs, seed=0)
        assert paths['rewards'].shape == (2, 16)
        assert np.isfinite(paths['rewards']).all()


def test_meta_test_pipeline_on_terrain_holdout(tmp_path):
    """The continuous-OOD meta-test path on CPU (round 5): train a tiny
    GrBAL on hfield terrain_set {gentle,hill}, snapshot, rebuild on the
    HELD-OUT terrain via meta_test.resolve_eval_env + build_policy (the
    single-load protocol), and roll out adapted vs pre-update."""
    from learning_to_adapt_tpu.envs import HalfCheetahHFieldEnv
    from learning_to_adapt_tpu.models import MetaMLPDynamicsModel as MM

    exp_dir = str(tmp_path / 'exp')
    logger.configure(dir=exp_dir, format_strs=['csv'], snapshot_mode='last')
    config = dict(n_candidates=8, horizon=3, meta_batch_size=4,
                  inner_learning_rate=0.001, adapt_batch_size=4,
                  hidden_sizes_model=[32], discount=1.0, use_cem=False,
                  task='hfield', terrain_set=['gentle', 'hill'])
    with open(os.path.join(exp_dir, 'params.json'), 'w') as f:
        json.dump(config, f)

    env = normalize(HalfCheetahHFieldEnv(task='hfield',
                                         reset_every_episode=True,
                                         terrain_set=('gentle', 'hill')))
    model = MM('dyn_model', env, hidden_sizes=(32,), meta_batch_size=4,
               batch_size=4)
    policy = MPCController('policy', env, model, n_candidates=8, horizon=3)
    sampler = Sampler(env=env, policy=policy, num_rollouts=2,
                      max_path_length=24, adapt_batch_size=4)
    trainer = Trainer(env=env, policy=policy, dynamics_model=model,
                      sampler=sampler,
                      sample_processor=ModelSampleProcessor(recurrent=True),
                      n_itr=2, initial_random_samples=True,
                      dynamics_model_max_epochs=2)
    trainer.train()

    sim_policy = _load_module('experiment_utils/sim_policy.py', 'sim_policy')
    meta_test = _load_module('benchmarks/meta_test.py', 'meta_test_e2e')
    env1, model1, _, cfg1, adapt_bs = sim_policy.load_experiment(exp_dir)
    base = env1.wrapped_env
    assert base.terrain_set == ('gentle', 'hill')
    eval_env, train_set, eval_set, _ = meta_test.resolve_eval_env(
        base, 'steep')
    assert train_set == ('gentle', 'hill') and eval_set == ('steep',)
    policy1 = sim_policy.build_policy(eval_env, model1, cfg1)
    assert adapt_bs == 4
    for bs in (adapt_bs, None):  # adapted vs pre-update on held-out terrain
        paths = sim_policy.rollout(eval_env, policy1, model1,
                                   max_path_length=16, num_rollouts=2,
                                   adapt_batch_size=bs, seed=0)
        assert paths['rewards'].shape == (2, 16)
        assert np.isfinite(paths['rewards']).all()
