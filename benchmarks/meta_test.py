"""Meta-test on HELD-OUT dynamics — the evaluation protocol the paper
actually performs (arXiv:1803.11347 sec. 5; reference ant_env.py:105-106
reserves Ant leg 3 for meta-test and the train distribution never samples
it).

Loads a snapshot trained on the train task distribution and evaluates it
on held-out task(s), comparing:

  adapted     GrBAL with the online fast-adaptation loop (per-step inner
              gradient step on the trailing window — the paper's mechanism)
  pre-update  the same meta-trained model with adaptation DISABLED
              (pre-update parameters throughout)
  (MB-MPC snapshots evaluate as a single non-adaptive mode; ReBAL
  snapshots evaluate the recurrent mechanism plus its ablations —
  'rebal_hidden_zero' plans from the initial hidden state every step and
  'rebal_hidden_frozen' stops the hidden update after a 16-step warmup,
  the recurrent analog of the adapted/pre-update split)

Holdout kinds supported by --eval_set (dispatch on the snapshot's task):
  cripple   comma-separated held-out leg/actuator ids, e.g. "3"
            (discrete tasks: Ant leg-3, cheetah leave-one-out actuators)
  terrain   comma-separated named terrain variants, e.g. "steep,basin"
            (continuous tasks: hfield snapshot trained with
            --terrain_set gentle,hill; reference
            half_cheetah_hfield_env.py:76-166)
  damping   a "lo:hi" range, e.g. "12:20" (continuous tasks: blocks
            snapshot trained on the reference's U(0,10) damping draw,
            half_cheetah_blocks_env.py:72-84; eval extrapolates the range)

Optional sensitivity sweep: --inner_lrs / --windows re-run the adapted mode
with eval-time inner learning rates / adaptation window lengths (the
meta-prior is fixed; only the fast-update strength changes).

Usage (TPU, after training the holdout runs):
    python benchmarks/meta_test.py data/grbal/ant_cripple_r4_s0 \
        --eval_set 3 --tag ant_leg3_grbal_s0
    python benchmarks/meta_test.py data/grbal/hfield_holdout_r5_s0 \
        --eval_set steep --tag hfield_steep_grbal_s0
    python benchmarks/meta_test.py data/grbal/blocks_r5_s0 \
        --eval_set 12:20 --tag blocks_ood_grbal_s0
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

from experiment_utils.sim_policy import (  # noqa: E402
    build_policy, load_experiment, rollout)
from learning_to_adapt_tpu.envs import (  # noqa: E402
    Arm7DofEnv, HalfCheetahBlocksEnv, HalfCheetahHFieldEnv, normalize)
from learning_to_adapt_tpu.utils.serializable import Serializable  # noqa: E402

TERRAINS = HalfCheetahHFieldEnv.NAMED_TERRAINS


def eval_mode(env, policy, model, label, adapt_bs, seeds, num_rollouts,
              max_path_length, results, ablate_hidden=None,
              ablate_warmup=16):
    rets = []
    per_seed = []
    for seed in seeds:
        paths = rollout(env, policy, model, max_path_length=max_path_length,
                        num_rollouts=num_rollouts, adapt_batch_size=adapt_bs,
                        seed=seed, ablate_hidden=ablate_hidden,
                        ablate_warmup=ablate_warmup)
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


def gap_stats(a, b):
    """Difference-of-means with pooled SEM."""
    return dict(mean=float(a.mean() - b.mean()),
                sem=float(np.sqrt(a.var() / a.size + b.var() / b.size)))


def _warn_overlap(kind, train_set, eval_set, overlapping):
    if overlapping:
        print(f'WARNING: eval {kind} {eval_set} overlaps train '
              f'distribution {train_set} — not a holdout evaluation',
              flush=True)


def resolve_eval_env(base, eval_spec):
    """Clone the train env onto the held-out task distribution.

    Dispatches on the eval_spec syntax + snapshot task kind; returns
    (eval_env, train_set, eval_set, set_kind) where set_kind is
    'discrete' (terrain names / cripple ids: set disjointness decides
    holdout-ness) or 'range' (continuous lo:hi interval)."""
    toks = [t.strip() for t in eval_spec.split(',')]
    if all(t in TERRAINS for t in toks):
        assert isinstance(base, HalfCheetahHFieldEnv), \
            f'terrain eval set on a {type(base).__name__} snapshot'
        train_set = tuple(base.terrain_set or (base.task,))
        eval_set = tuple(toks)
        _warn_overlap('terrains', train_set, eval_set,
                      set(train_set) & set(eval_set))
        eval_env = normalize(Serializable.clone(base, terrain_set=eval_set))
        set_kind = 'discrete'
    elif len(toks) == 1 and ':' in toks[0]:
        # "lo:hi" = a continuous range holdout; the range parameter it
        # overrides depends on the snapshot's task kind
        lo, hi = (float(x) for x in toks[0].split(':'))
        if isinstance(base, HalfCheetahBlocksEnv):
            attr = 'damping_range'
        else:
            assert isinstance(base, Arm7DofEnv) and base.task == 'force', \
                f'range eval set on a {type(base).__name__} snapshot ' \
                f'(task={base.task}) — supported: blocks damping, arm force'
            attr = 'force_range'
        train_set = tuple(getattr(base, attr))
        eval_set = (lo, hi)
        _warn_overlap(attr, train_set, eval_set,
                      lo < train_set[1] and hi > train_set[0])
        eval_env = normalize(Serializable.clone(base, **{attr: (lo, hi)}))
        set_kind = 'range'
    else:
        assert base.task == 'cripple', (
            f'integer eval sets are the cripple-task protocol, snapshot '
            f'has task={base.task}')
        eval_set = tuple(int(x) for x in toks)
        train_set = tuple(base.cripple_set)
        _warn_overlap('set', train_set, eval_set,
                      set(train_set) & set(eval_set))
        eval_env = normalize(Serializable.clone(base, cripple_set=eval_set))
        set_kind = 'discrete'
    return eval_env, train_set, eval_set, set_kind


def main():
    p = argparse.ArgumentParser()
    p.add_argument('exp_dir', type=str)
    p.add_argument('--eval_set', type=str, default=None,
                   help='held-out task spec (see module docstring): '
                        'cripple ids "3", terrain names "steep,basin", or '
                        'damping range "12:20"; omit to evaluate on the '
                        'snapshot\'s own task distribution '
                        '(fixed-protocol evaluator mode)')
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
    p.add_argument('--skip_ablations', action='store_true',
                   help='for recurrent snapshots, evaluate only the full '
                        'recurrent mode (no hidden-state ablations)')
    p.add_argument('--ablate_warmup', type=int, default=16,
                   help='warmup steps before the frozen-hidden ablation '
                        'stops updating (match to the GrBAL comparison '
                        'window; default 16 = the canonical '
                        'adapt_batch_size)')
    args = p.parse_args()

    from learning_to_adapt_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()

    seeds = [int(s) for s in args.seeds.split(',')]

    # ONE snapshot load; the eval env (if any) rebinds model + policy
    # without re-unpickling (advisor round-4 finding)
    env, model, policy, config, adapt_bs = load_experiment(args.exp_dir)
    base = env.wrapped_env
    if args.eval_set is not None:
        env, train_set, eval_set, set_kind = resolve_eval_env(
            base, args.eval_set)
        policy = build_policy(env, model, config)
        print(f'{args.exp_dir}: trained on {train_set}, evaluating on '
              f'held-out {eval_set} '
              f'({"GrBAL" if adapt_bs else "non-adaptive/recurrent"})',
              flush=True)
    else:
        set_kind = 'discrete'
        if base.task == 'cripple':
            train_set = eval_set = tuple(base.cripple_set)
        elif getattr(base, 'terrain_set', None):
            train_set = eval_set = tuple(base.terrain_set)
        else:
            train_set = eval_set = base.task
        print(f'{args.exp_dir}: evaluating on its own task distribution '
              f'({base.task}), '
              f'({"GrBAL" if adapt_bs else "non-adaptive/recurrent"})',
              flush=True)

    results = dict(exp_dir=args.exp_dir, train_set=train_set,
                   eval_set=eval_set, seeds=seeds,
                   num_rollouts=args.num_rollouts,
                   max_path_length=args.max_path_length,
                   ablate_warmup=args.ablate_warmup, set_kind=set_kind)
    if adapt_bs:
        adapted = eval_mode(env, policy, model, 'adapted', adapt_bs, seeds,
                            args.num_rollouts, args.max_path_length, results)
        pre = eval_mode(env, policy, model, 'pre-update', None, seeds,
                        args.num_rollouts, args.max_path_length, results)
        results['gap'] = gap_stats(adapted, pre)
        print(f'online-adaptation gap on held-out dynamics: '
              f'{results["gap"]["mean"]:+.1f} +- {results["gap"]["sem"]:.1f}'
              f' (adapted - pre-update)', flush=True)

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
        from learning_to_adapt_tpu.models.rnn import RNNDynamicsModel
        if isinstance(model, RNNDynamicsModel):
            # ReBAL: the hidden-state update by each real transition IS the
            # adaptation mechanism (reference rnn_mpc_controller.py:63) —
            # isolate it with within-model ablations
            full = eval_mode(env, policy, model, 'rebal', None, seeds,
                             args.num_rollouts, args.max_path_length,
                             results)
            if not args.skip_ablations:
                zero = eval_mode(env, policy, model, 'rebal_hidden_zero',
                                 None, seeds, args.num_rollouts,
                                 args.max_path_length, results,
                                 ablate_hidden='zero')
                frozen = eval_mode(env, policy, model, 'rebal_hidden_frozen',
                                   None, seeds, args.num_rollouts,
                                   args.max_path_length, results,
                                   ablate_hidden='frozen',
                                   ablate_warmup=args.ablate_warmup)
                results['rebal_gap'] = gap_stats(full, zero)
                results['rebal_gap_frozen'] = gap_stats(full, frozen)
                print(f'recurrent-adaptation gap (full - hidden_zero): '
                      f'{results["rebal_gap"]["mean"]:+.1f} +- '
                      f'{results["rebal_gap"]["sem"]:.1f}; '
                      f'(full - hidden_frozen): '
                      f'{results["rebal_gap_frozen"]["mean"]:+.1f} +- '
                      f'{results["rebal_gap_frozen"]["sem"]:.1f}',
                      flush=True)
        else:
            eval_mode(env, policy, model, 'mb_mpc', None, seeds,
                      args.num_rollouts, args.max_path_length, results)

    tag = args.tag or os.path.basename(os.path.normpath(args.exp_dir))
    out = os.path.join('results', f'meta_test_{tag}.json')
    os.makedirs('results', exist_ok=True)
    with open(out, 'w') as f:
        json.dump(results, f, indent=2)
    print(f'wrote {out}', flush=True)


if __name__ == '__main__':
    main()
