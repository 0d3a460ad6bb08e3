"""Meta-test on HELD-OUT dynamics — the evaluation protocol the paper
actually performs (arXiv:1803.11347 sec. 5; reference ant_env.py:105-106
reserves Ant leg 3 for meta-test and the train distribution never samples
it).

Loads a snapshot trained on the train task distribution (Ant legs 0-2, or
a cheetah cripple_set with one actuator held out) and evaluates it on the
held-out task(s), comparing:

  adapted     GrBAL with the online fast-adaptation loop (per-step inner
              gradient step on the trailing window — the paper's mechanism)
  pre-update  the same meta-trained model with adaptation DISABLED
              (pre-update parameters throughout)
  (MB-MPC snapshots evaluate as a single non-adaptive mode)

Optional sensitivity sweep: --inner_lrs / --windows re-run the adapted mode
with eval-time inner learning rates / adaptation window lengths (the
meta-prior is fixed; only the fast-update strength changes — VERDICT
round-3 next-step #1's fallback analysis).

Usage (TPU, after training the holdout runs):
    python benchmarks/meta_test.py data/grbal/ant_cripple_r4_s0 \
        --eval_set 3 --tag ant_leg3_grbal_s0
    python benchmarks/meta_test.py data/mb_mpc/ant_cripple_r4_s0 \
        --eval_set 3 --tag ant_leg3_mbmpc_s0
    python benchmarks/meta_test.py data/grbal/cheetah_holdout_r4_s0 \
        --eval_set 4 --tag cheetah_act4_grbal_s0 \
        --inner_lrs 0.001,0.01,0.1 --windows 8,16,32
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

from experiment_utils.sim_policy import load_experiment, rollout  # noqa: E402
from learning_to_adapt_tpu.envs import normalize  # noqa: E402
from learning_to_adapt_tpu.utils.serializable import Serializable  # noqa: E402


def eval_mode(env, policy, model, label, adapt_bs, seeds, num_rollouts,
              max_path_length, results):
    rets = []
    per_seed = []
    for seed in seeds:
        paths = rollout(env, policy, model, max_path_length=max_path_length,
                        num_rollouts=num_rollouts, adapt_batch_size=adapt_bs,
                        seed=seed)
        r = paths['rewards'].sum(axis=1)
        per_seed.append(float(r.mean()))
        rets.extend(r.tolist())
    rets = np.asarray(rets)
    results[label] = dict(mean=float(rets.mean()), std=float(rets.std()),
                          sem=float(rets.std() / np.sqrt(rets.size)),
                          n=int(rets.size), per_seed_mean=per_seed)
    print(f'{label}: {rets.mean():.1f} +- {rets.std():.1f} '
          f'(SEM {rets.std() / np.sqrt(rets.size):.1f}, n={rets.size} '
          f'rollouts x {max_path_length} steps)', flush=True)
    return rets


def main():
    p = argparse.ArgumentParser()
    p.add_argument('exp_dir', type=str)
    p.add_argument('--eval_set', type=str, default=None,
                   help='comma-separated held-out leg/actuator ids, '
                        'e.g. "3" for the Ant meta-test leg; omit to '
                        'evaluate on the snapshot\'s own task '
                        'distribution (fixed-protocol evaluator mode — '
                        'e.g. 1000-step cross-algorithm comparisons of '
                        'nominal snapshots)')
    p.add_argument('--tag', type=str, default=None)
    p.add_argument('--seeds', type=str, default='0,1,2')
    p.add_argument('--num_rollouts', type=int, default=5)
    p.add_argument('--max_path_length', type=int, default=1000)
    p.add_argument('--inner_lrs', type=str, default=None,
                   help='comma-separated eval-time inner learning rates to '
                        'sweep for the adapted mode')
    p.add_argument('--windows', type=str, default=None,
                   help='comma-separated eval-time adaptation window '
                        'lengths to sweep')
    args = p.parse_args()

    seeds = [int(s) for s in args.seeds.split(',')]

    if args.eval_set is not None:
        eval_set = tuple(int(x) for x in args.eval_set.split(','))
        # rebuild the snapshot's env with the HELD-OUT task distribution
        env_train, _, _, config, _ = load_experiment(args.exp_dir)
        base = env_train.wrapped_env
        assert base.task == 'cripple', (
            f'meta-test protocol is for cripple tasks, snapshot has '
            f'{base.task}')
        train_set = tuple(base.cripple_set)
        overlap = set(train_set) & set(eval_set)
        if overlap:
            print(f'WARNING: eval set {eval_set} overlaps train '
                  f'distribution {train_set} ({sorted(overlap)}) — not a '
                  'holdout evaluation', flush=True)
        eval_env = normalize(Serializable.clone(base, cripple_set=eval_set))
        env, model, policy, config, adapt_bs = load_experiment(
            args.exp_dir, env_override=eval_env)
        print(f'{args.exp_dir}: trained on cripple_set={train_set}, '
              f'evaluating on held-out {eval_set} '
              f'({"GrBAL" if adapt_bs else "non-adaptive"})', flush=True)
    else:
        # fixed-protocol evaluator: the snapshot's own task distribution
        env, model, policy, config, adapt_bs = load_experiment(args.exp_dir)
        train_set = eval_set = (tuple(env.wrapped_env.cripple_set)
                                if env.wrapped_env.task == 'cripple'
                                else env.wrapped_env.task)
        print(f'{args.exp_dir}: evaluating on its own task distribution '
              f'({env.wrapped_env.task}), '
              f'({"GrBAL" if adapt_bs else "non-adaptive"})', flush=True)

    results = dict(exp_dir=args.exp_dir, train_set=train_set,
                   eval_set=eval_set, seeds=seeds,
                   num_rollouts=args.num_rollouts,
                   max_path_length=args.max_path_length)
    if adapt_bs:
        adapted = eval_mode(env, policy, model, 'adapted', adapt_bs, seeds,
                            args.num_rollouts, args.max_path_length, results)
        pre = eval_mode(env, policy, model, 'pre-update', None, seeds,
                        args.num_rollouts, args.max_path_length, results)
        gap = adapted.mean() - pre.mean()
        # pooled SEM of the difference of means
        sem = float(np.sqrt(adapted.var() / adapted.size +
                            pre.var() / pre.size))
        results['gap'] = dict(mean=float(gap), sem=sem)
        print(f'online-adaptation gap on held-out dynamics: {gap:+.1f} '
              f'+- {sem:.1f} (adapted - pre-update)', flush=True)

        base_lr = model.inner_learning_rate
        if args.inner_lrs:
            for lr in (float(x) for x in args.inner_lrs.split(',')):
                model.inner_learning_rate = lr
                eval_mode(env, policy, model, f'adapted_lr{lr:g}', adapt_bs,
                          seeds, args.num_rollouts, args.max_path_length,
                          results)
            model.inner_learning_rate = base_lr
        if args.windows:
            for w in (int(x) for x in args.windows.split(',')):
                eval_mode(env, policy, model, f'adapted_window{w}', w, seeds,
                          args.num_rollouts, args.max_path_length, results)
    else:
        # non-GrBAL snapshots: MB-MPC is truly non-adaptive; ReBAL's
        # recurrent hidden state IS its adaptation mechanism and is
        # always-on inside the rollout — label accordingly
        from learning_to_adapt_tpu.models.rnn import RNNDynamicsModel
        label = ('rebal' if isinstance(model, RNNDynamicsModel)
                 else 'mb_mpc')
        eval_mode(env, policy, model, label, None, seeds,
                  args.num_rollouts, args.max_path_length, results)

    tag = args.tag or os.path.basename(os.path.normpath(args.exp_dir))
    out = os.path.join('results', f'meta_test_{tag}.json')
    os.makedirs('results', exist_ok=True)
    with open(out, 'w') as f:
        json.dump(results, f, indent=2)
    print(f'wrote {out}', flush=True)


if __name__ == '__main__':
    main()
