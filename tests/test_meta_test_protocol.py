"""Round-5 meta-test protocol extensions:

- continuous-OOD task splits: hfield terrain_set (train {gentle,hill},
  eval {steep}/{basin}) and blocks damping_range extrapolation — the
  continuous analogs of the Ant leg-3 holdout (reference
  half_cheetah_hfield_env.py:76-166, half_cheetah_blocks_env.py:72-84)
- ReBAL hidden-state ablations ('zero'/'frozen') — the recurrent analog
  of GrBAL's adapted/pre-update split (reference
  rnn_mpc_controller.py:63 advances the real hidden every step)
- the --resume task-identity guard (a resumed holdout run must not
  silently continue on a different task distribution)
"""
import importlib.util
import json
import os

import jax
import numpy as np
import pytest

from learning_to_adapt_tpu.envs import (
    HalfCheetahBlocksEnv, HalfCheetahEnv, HalfCheetahHFieldEnv, normalize)
from learning_to_adapt_tpu.models import RNNDynamicsModel
from learning_to_adapt_tpu.policies import RNNMPCController
from learning_to_adapt_tpu.samplers.rollout import make_rollout_fn
from learning_to_adapt_tpu.utils.config import check_resume_config
from learning_to_adapt_tpu.utils.serializable import Serializable

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_module(relpath, name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_REPO, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestContinuousTaskSplits:
    def test_terrain_set_draws_only_members(self):
        env = HalfCheetahHFieldEnv(task='hfield', reset_every_episode=True,
                                   terrain_set=('gentle', 'hill'))
        refs = {n: np.asarray(env._named_profile(n)[0])
                for n in ('gentle', 'hill', 'steep', 'basin')}
        seen = set()
        for i in range(10):
            st = env.reset(jax.random.PRNGKey(i), episode_idx=1)
            row = np.asarray(st.mm.hfield_row)
            match = [n for n, r in refs.items()
                     if np.allclose(row, r, atol=1e-6)]
            assert match, 'sampled terrain matches no named profile'
            assert match[0] in ('gentle', 'hill'), \
                f'terrain {match[0]} outside the train set'
            seen.add(match[0])
        assert seen == {'gentle', 'hill'}, \
            f'10 episodes drew only {seen} — not sampling the whole set'

    def test_terrain_set_clone_is_the_holdout_env(self):
        env = HalfCheetahHFieldEnv(task='hfield',
                                   terrain_set=('gentle', 'hill'))
        ev = Serializable.clone(env, terrain_set=('steep',))
        assert ev.terrain_set == ('steep',)
        st = ev.reset(jax.random.PRNGKey(0), episode_idx=1)
        ref, size = env._named_profile('steep')
        np.testing.assert_allclose(np.asarray(st.mm.hfield_row),
                                   np.asarray(ref), atol=1e-6)
        assert abs(float(st.mm.hfield_size[2]) - float(size[2])) < 1e-6

    def test_terrain_set_rejects_unknown_names(self):
        with pytest.raises(AssertionError):
            HalfCheetahHFieldEnv(task='hfield', terrain_set=('cliff',))

    def test_damping_range_extrapolation(self):
        env = HalfCheetahBlocksEnv(task='damping', reset_every_episode=True)
        assert env.damping_range == (0.0, 10.0)  # the reference's U(0,10)
        ev = Serializable.clone(env, damping_range=(12.0, 20.0))
        for i in range(5):
            st = ev.reset(jax.random.PRNGKey(i), episode_idx=1)
            d = np.asarray(st.mm.dof_damping[:8])
            assert d.min() >= 12.0 and d.max() <= 20.0
        # train draw stays inside its own range
        st = env.reset(jax.random.PRNGKey(0), episode_idx=1)
        d = np.asarray(st.mm.dof_damping[:8])
        assert d.min() >= 0.0 and d.max() <= 10.0


class TestResolveEvalEnv:
    """benchmarks/meta_test.py dispatch: one flag syntax, three task
    kinds."""

    @pytest.fixture(scope='class')
    def meta_test(self):
        return _load_module('benchmarks/meta_test.py', 'meta_test_mod')

    def test_cripple_ids(self, meta_test):
        base = HalfCheetahEnv(task='cripple', cripple_set=(1, 2, 3, 5))
        ev, tr, es, kind = meta_test.resolve_eval_env(base, '4')
        assert kind == 'discrete'
        assert tr == (1, 2, 3, 5) and es == (4,)
        assert ev.wrapped_env.cripple_set == (4,)

    def test_terrain_names(self, meta_test):
        base = HalfCheetahHFieldEnv(task='hfield',
                                    terrain_set=('gentle', 'hill'))
        ev, tr, es, kind = meta_test.resolve_eval_env(base, 'steep,basin')
        assert kind == 'discrete'
        assert tr == ('gentle', 'hill') and es == ('steep', 'basin')
        assert ev.wrapped_env.terrain_set == ('steep', 'basin')

    def test_damping_span(self, meta_test):
        base = HalfCheetahBlocksEnv(task='damping')
        ev, tr, es, kind = meta_test.resolve_eval_env(base, '12:20')
        assert kind == 'range'
        assert tr == (0.0, 10.0) and es == (12.0, 20.0)
        assert ev.wrapped_env.damping_range == (12.0, 20.0)

    def test_arm_force_span(self, meta_test):
        from learning_to_adapt_tpu.envs import Arm7DofEnv
        base = Arm7DofEnv(task='force')
        ev, tr, es, kind = meta_test.resolve_eval_env(base, '3:6')
        assert kind == 'range'
        assert tr == (0.1, 2.0) and es == (3.0, 6.0)
        assert ev.wrapped_env.force_range == (3.0, 6.0)

    def test_kind_mismatch_raises(self, meta_test):
        base = HalfCheetahEnv(task='cripple')
        with pytest.raises(AssertionError):
            meta_test.resolve_eval_env(base, 'steep')
        from learning_to_adapt_tpu.envs import Arm7DofEnv
        with pytest.raises(AssertionError):
            # range syntax on an arm snapshot whose task is not 'force'
            meta_test.resolve_eval_env(Arm7DofEnv(task='mass'), '3:6')


class TestRebalHiddenAblation:
    def test_modes_change_trajectories_and_stay_finite(self):
        env = normalize(HalfCheetahEnv(task='cripple',
                                       reset_every_episode=True))
        model = RNNDynamicsModel('dyn', env, hidden_sizes=(16,),
                                 cell_type='lstm', batch_size=4,
                                 backprop_steps=8)
        policy = RNNMPCController('policy', env, model, n_candidates=8,
                                  horizon=3)
        rets = {}
        for mode in (None, 'zero', 'frozen'):
            fn = make_rollout_fn(env, policy, model, 2, 24,
                                 ablate_hidden=mode, ablate_warmup=8)
            paths = fn(model.params, model.normalizer,
                       jax.random.PRNGKey(0), np.int32(1))
            r = np.asarray(paths['rewards'])
            assert np.isfinite(r).all()
            rets[mode] = r.sum(axis=1)
        # ablating the hidden update must change the executed actions once
        # the hidden state would have diverged from zero
        assert not np.allclose(rets[None], rets['zero'])
        assert not np.allclose(rets[None], rets['frozen'])

    def test_ablation_requires_recurrent_model(self):
        from learning_to_adapt_tpu.models import MLPDynamicsModel
        from learning_to_adapt_tpu.policies import MPCController
        env = normalize(HalfCheetahEnv(task=None))
        model = MLPDynamicsModel('dyn', env, hidden_sizes=(16,),
                                 batch_size=8)
        policy = MPCController('policy', env, model, n_candidates=8,
                               horizon=3)
        with pytest.raises(AssertionError):
            make_rollout_fn(env, policy, model, 2, 8, ablate_hidden='zero')


class TestSummaryPooling:
    """benchmarks/summarize_meta_test.py seed-extension pooling must be
    exact: pooling two disjoint halves of one sample reproduces the whole
    sample's mean/std/sem."""

    @pytest.fixture(scope='class')
    def sm(self):
        return _load_module('benchmarks/summarize_meta_test.py',
                            'summarize_meta_test_mod')

    def test_pool_modes_exact(self, sm):
        rng = np.random.RandomState(0)
        x = rng.randn(90) * 25 + 100
        def summ(v):
            return dict(mean=float(v.mean()), std=float(v.std()),
                        n=len(v), per_seed_mean=[])
        p = sm.pool_modes(summ(x[:30]), summ(x[30:]))
        assert abs(p['mean'] - x.mean()) < 1e-8
        assert abs(p['std'] - x.std()) < 1e-8
        assert abs(p['sem'] - x.std() / np.sqrt(90)) < 1e-8
        assert p['n'] == 90

    def test_ext_files_fold_into_base(self, sm, tmp_path):
        import json as js
        rng = np.random.RandomState(1)
        a = rng.randn(30) + 50
        b = rng.randn(60) + 55
        both = np.concatenate([a, b])
        def doc(v, seeds, pre):
            return dict(train_set=[1, 2], eval_set=[3], seeds=seeds,
                        adapted=dict(mean=float(v.mean()),
                                     std=float(v.std()), n=len(v),
                                     per_seed_mean=[]),
                        **{'pre-update': dict(mean=float(pre.mean()),
                                              std=float(pre.std()),
                                              n=len(pre),
                                              per_seed_mean=[])})
        pre_a, pre_b = a - 10, b - 12
        (tmp_path / 'meta_test_ant_leg3_x_s0.json').write_text(
            js.dumps(doc(a, [0, 1], pre_a)))
        (tmp_path / 'meta_test_ant_leg3_x_s0_ext.json').write_text(
            js.dumps(doc(b, [2, 3, 4], pre_b)))
        docs = sm.load_pooled(str(tmp_path / 'meta_test_*.json'))
        assert list(docs) == ['ant_leg3_x_s0']
        d = docs['ant_leg3_x_s0']
        assert d['adapted']['n'] == 90
        assert abs(d['adapted']['mean'] - both.mean()) < 1e-8
        # gap recomputed from the POOLED modes
        pooled_pre = np.concatenate([pre_a, pre_b])
        assert abs(d['gap']['mean'] - (both.mean() - pooled_pre.mean())) \
            < 1e-8
        assert d['seeds'] == [0, 1, 2, 3, 4]

    def test_is_ood_is_data_driven(self, sm):
        ood = sm.is_ood
        # discrete holdouts: disjoint sets
        assert ood(dict(train_set=[0, 1, 2], eval_set=[3]))
        assert ood(dict(train_set=[1, 2, 3, 5], eval_set=[4]))
        assert not ood(dict(train_set=[0, 1, 2], eval_set=[0, 1, 2]))
        assert not ood(dict(train_set=[1, 2, 3], eval_set=[3, 4]))
        # terrain names
        assert ood(dict(train_set=['gentle', 'hill'], eval_set=['steep']))
        assert not ood(dict(train_set=['gentle', 'hill'],
                            eval_set=['hill']))
        # continuous ranges: interval disjointness, not endpoint sets
        assert ood(dict(train_set=[0.0, 10.0], eval_set=[12.0, 20.0]))
        assert not ood(dict(train_set=[0.0, 10.0], eval_set=[5.0, 15.0]))
        # fixed-protocol evaluations
        assert not ood(dict(train_set='damping', eval_set='damping'))
        assert not ood(dict(train_set=None, eval_set=None))

    def test_protocol_mismatch_refused(self, sm, tmp_path):
        import json as js
        mk = dict(train_set=[1], eval_set=[2], num_rollouts=5,
                  max_path_length=1000, seeds=[0],
                  adapted=dict(mean=0.0, std=1.0, n=5, per_seed_mean=[]))
        (tmp_path / 'meta_test_p_s0.json').write_text(js.dumps(mk))
        bad = dict(mk, seeds=[1], max_path_length=500)
        (tmp_path / 'meta_test_p_s0_ext.json').write_text(js.dumps(bad))
        with pytest.raises(AssertionError, match='max_path_length'):
            sm.load_pooled(str(tmp_path / 'meta_test_*.json'))

    def test_repeated_seeds_refused(self, sm, tmp_path):
        import json as js
        base = dict(train_set=[1], eval_set=[2], seeds=[0, 1],
                    adapted=dict(mean=0.0, std=1.0, n=10, per_seed_mean=[]))
        (tmp_path / 'meta_test_t_s0.json').write_text(js.dumps(base))
        (tmp_path / 'meta_test_t_s0_ext.json').write_text(js.dumps(base))
        with pytest.raises(AssertionError, match='repeats eval seeds'):
            sm.load_pooled(str(tmp_path / 'meta_test_*.json'))


class TestResumeGuard:
    def _save(self, tmp_path, cfg):
        with open(os.path.join(tmp_path, 'params.json'), 'w') as f:
            json.dump(cfg, f)

    def test_matching_config_passes(self, tmp_path):
        saved = dict(env={'$class': 'learning_to_adapt_tpu.envs.'
                                    'half_cheetah.HalfCheetahEnv'},
                     task='cripple', cripple_set=[1, 2, 3, 5], seed=0)
        self._save(tmp_path, saved)
        check_resume_config(str(tmp_path),
                            dict(env=HalfCheetahEnv, task='cripple',
                                 cripple_set=(1, 2, 3, 5), seed=0))

    def test_dropped_cripple_set_raises(self, tmp_path):
        # the advisor's scenario: operator forgets --cripple_set on resume
        self._save(tmp_path, dict(task='cripple', cripple_set=[1, 2, 3, 5],
                                  seed=0))
        with pytest.raises(ValueError, match='cripple_set'):
            check_resume_config(str(tmp_path),
                                dict(task='cripple', seed=0))

    def test_env_mismatch_raises(self, tmp_path):
        self._save(tmp_path, dict(env={'$class': 'learning_to_adapt_tpu.'
                                                 'envs.ant.AntEnv'},
                                  task='cripple', seed=0))
        with pytest.raises(ValueError, match='env'):
            check_resume_config(str(tmp_path),
                                dict(env=HalfCheetahEnv, task='cripple',
                                     seed=0))

    def test_no_saved_config_is_a_noop(self, tmp_path):
        check_resume_config(str(tmp_path), dict(task='cripple'))

    def test_dropped_force_range_raises(self, tmp_path):
        # force_range is a resume-identity key like the other
        # task-distribution params (advisor round-5): resuming an arm
        # force run without the flag must refuse, not continue training
        # on the default U(0.1,2) distribution
        self._save(tmp_path, dict(task='force', force_range=[3.0, 6.0],
                                  seed=0))
        with pytest.raises(ValueError, match='force_range'):
            check_resume_config(str(tmp_path), dict(task='force', seed=0))


class TestTaskDistributionHelpers:
    """The shared CLI-flag/env-kwargs plumbing used by all three run
    scripts, load_experiment, and the resume guard (one source of
    truth — utils/config.py TASK_DISTRIBUTION_KEYS)."""

    def test_flags_parse_into_config_and_env_kwargs(self):
        import argparse
        from learning_to_adapt_tpu.utils.config import (
            RESUME_IDENTITY_KEYS, TASK_DISTRIBUTION_KEYS,
            add_task_distribution_args, apply_task_distribution_args,
            task_env_kwargs)
        p = argparse.ArgumentParser()
        add_task_distribution_args(p)
        args = p.parse_args(['--cripple_set', '1,2,3,5',
                             '--terrain_set', 'gentle,hill',
                             '--damping_range', '0:10',
                             '--force_range', '0.1:2'])
        config = {}
        apply_task_distribution_args(args, config)
        assert config == dict(cripple_set=(1, 2, 3, 5),
                              terrain_set=('gentle', 'hill'),
                              damping_range=(0.0, 10.0),
                              force_range=(0.1, 2.0))
        assert task_env_kwargs(config) == config
        # absent flags stay absent (env ctors keep their defaults)
        config2 = {}
        apply_task_distribution_args(p.parse_args([]), config2)
        assert config2 == {} and task_env_kwargs(config2) == {}
        # every distribution key is resume-guarded
        assert set(TASK_DISTRIBUTION_KEYS) <= set(RESUME_IDENTITY_KEYS)
