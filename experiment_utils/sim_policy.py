"""Replay a trained snapshot (reference experiment_utils/sim_policy.py).

Loads params.pkl + params.json from an experiment directory, rebuilds the
env/model/policy, and re-runs the MPC policy with optional online adaptation
— headless on TPU/CPU; writes the trajectory (qpos sequence + rewards) to
.npz for offline visualization (tools/render_trajectory.py) instead of
opening a MuJoCo viewer window.
"""
import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np  # noqa: E402

from learning_to_adapt_tpu.envs import (  # noqa: E402
    AntEnv, Arm7DofEnv, HalfCheetahBlocksEnv, HalfCheetahEnv,
    HalfCheetahHFieldEnv, normalize)
from learning_to_adapt_tpu.models import (  # noqa: E402
    MetaMLPDynamicsModel, MLPDynamicsModel, RNNDynamicsModel)
from learning_to_adapt_tpu.policies import (  # noqa: E402
    MPCController, RNNMPCController)
from learning_to_adapt_tpu.samplers import Sampler  # noqa: E402

ENV_CLASSES = {c.__name__: c for c in
               (HalfCheetahEnv, HalfCheetahHFieldEnv, HalfCheetahBlocksEnv,
                AntEnv, Arm7DofEnv)}


def load_experiment(exp_dir, env_override=None):
    """Rebuild (env, model, policy) from a snapshot directory.

    env_override: use this env instead of the snapshot's (the meta-test
    protocol evaluates a trained model on a DIFFERENT task distribution,
    e.g. the held-out Ant leg — benchmarks/meta_test.py)."""
    with open(os.path.join(exp_dir, 'params.json')) as f:
        config = json.load(f)
    with open(os.path.join(exp_dir, 'params.pkl'), 'rb') as f:
        snapshot = pickle.load(f)

    if env_override is not None:
        env = env_override
    elif 'env' in snapshot:
        # newer snapshots carry the env object itself (Serializable
        # ctor-replay pickling — exact task/noise/frame_skip config)
        env = snapshot['env']
    else:
        env_name = config['env']
        if isinstance(env_name, dict):
            env_name = env_name.get('$class', '').split('.')[-1]
        env_cls = ENV_CLASSES[env_name.split('.')[-1]]
        # rebuild with the snapshot's recorded task-distribution params —
        # dropping them here would misstate train_set in the meta-test
        # protocol (and evaluate a default distribution)
        from learning_to_adapt_tpu.utils.config import task_env_kwargs
        env_kw = task_env_kwargs(config)
        env = normalize(env_cls(reset_every_episode=True,
                                task=config.get('task'), **env_kw))

    if 'meta_batch_size' in config:
        model = MetaMLPDynamicsModel(
            'dyn_model', env, meta_batch_size=config['meta_batch_size'],
            inner_learning_rate=config['inner_learning_rate'],
            hidden_sizes=tuple(config['hidden_sizes_model']),
            batch_size=config['adapt_batch_size'])
        adapt_batch_size = config.get('adapt_batch_size')
    elif 'cell_type' in config:
        model = RNNDynamicsModel(
            'dyn_model', env, hidden_sizes=tuple(config['hidden_sizes']),
            cell_type=config['cell_type'],
            backprop_steps=config['backprop_steps'],
            batch_size=config['batch_size'])
        adapt_batch_size = None
    else:
        model = MLPDynamicsModel(
            'dyn_model', env, hidden_sizes=tuple(config['hidden_sizes']),
            batch_size=config['batch_size'])
        adapt_batch_size = None

    model.load_state_dict(snapshot['dynamics_model'])
    policy = build_policy(env, model, config)
    return env, model, policy, config, adapt_batch_size


def build_policy(env, model, config):
    """Planner for a loaded model against `env` (the meta-test protocol
    rebinds a trained model's policy to a held-out-task env without
    re-unpickling the snapshot — benchmarks/meta_test.py)."""
    policy_cls = (RNNMPCController if isinstance(model, RNNDynamicsModel)
                  else MPCController)
    return policy_cls(
        'policy', env, model,
        discount=config.get('discount', 1.0),
        n_candidates=config['n_candidates'],
        horizon=config['horizon'],
        use_cem=config.get('use_cem', False),
        num_cem_iters=config.get('num_cem_iters', 5))


def rollout(env, policy, model, max_path_length=1000, num_rollouts=1,
            adapt_batch_size=None, seed=0, ablate_hidden=None,
            ablate_warmup=16):
    """Re-run the policy through the fused on-device engine (replaces the
    reference's render loop, samplers/utils.py:4-56)."""
    sampler = Sampler(env=env, policy=policy, num_rollouts=num_rollouts,
                      max_path_length=max_path_length,
                      adapt_batch_size=adapt_batch_size, seed=seed,
                      ablate_hidden=ablate_hidden,
                      ablate_warmup=ablate_warmup)
    sampler._episode_idx = 1  # replay with tasks active
    return sampler.obtain_samples()


def check_native(env, paths, n_steps=None):
    """Cross-check the replayed device trajectory against the native C++
    physics oracle (native/ltao_physics.cc): re-executes each recorded
    action from the recorded previous (qpos, qvel) through the oracle and
    reports the worst one-step qpos deviation. Valid for nominal dynamics
    (task=None) — task-perturbed MutableModels live on device inside the
    rollout and are not recorded."""
    from learning_to_adapt_tpu.native import NativePhysics
    base = env.wrapped_env
    nat = NativePhysics(base.model)
    qpos, qvel, acts = paths['qpos'][0], paths['qvel'][0], paths['actions'][0]
    lo = np.asarray(base.model.act_ctrlrange[:, 0])
    hi = np.asarray(base.model.act_ctrlrange[:, 1])
    T = n_steps or min(len(acts) - 1, 200)
    worst = 0.0
    for t in range(1, 1 + T):
        ctrl = np.clip(lo + (np.asarray(acts[t]) + 1.0) * 0.5 * (hi - lo),
                       lo, hi)
        qp = np.asarray(qpos[t - 1], np.float64)
        qv = np.asarray(qvel[t - 1], np.float64)
        for _ in range(base.frame_skip):
            qp, qv = nat.step(qp, qv, ctrl)
        worst = max(worst, float(np.max(np.abs(qp - np.asarray(qpos[t])))))
    print(f'native oracle one-step qpos deviation over {T} steps: '
          f'{worst:.3e} (f32 device vs f64 C++; <1e-2 expected)')
    return worst


def main():
    p = argparse.ArgumentParser()
    p.add_argument('exp_dir', type=str)
    p.add_argument('--max_path_length', type=int, default=1000)
    p.add_argument('--num_rollouts', type=int, default=1)
    p.add_argument('--out', type=str, default=None)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--check-native', action='store_true',
                   help='verify the trajectory against the C++ oracle '
                        '(nominal dynamics only)')
    args = p.parse_args()

    env, model, policy, config, adapt_bs = load_experiment(args.exp_dir)
    paths = rollout(env, policy, model,
                    max_path_length=args.max_path_length,
                    num_rollouts=args.num_rollouts,
                    adapt_batch_size=adapt_bs, seed=args.seed)
    returns = paths['rewards'].sum(axis=1)
    print(f'returns: {returns} (mean {returns.mean():.2f})')
    if args.check_native:
        if config.get('task'):
            print('check-native skipped: task-perturbed dynamics are not '
                  'recorded in the trajectory (run with task=None)')
        else:
            check_native(env, paths)
    out = args.out or os.path.join(args.exp_dir, 'replay.npz')
    np.savez_compressed(out, **paths)
    print(f'trajectory saved to {out}')


if __name__ == '__main__':
    main()
