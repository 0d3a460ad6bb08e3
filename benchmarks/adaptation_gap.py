"""Adaptation-gap analysis (the paper's core claim, VERDICT.md next-step
#1): replay the trained GrBAL cheetah-cripple snapshot on freshly sampled
crippled-actuator tasks WITH the online fast-adaptation loop and WITHOUT it
(pre-update parameters throughout), and report the return gap.

Reference analog: GrBAL vs MB-MPC on perturbed envs (arXiv:1803.11347
fig. 5-7); here the comparison isolates adaptation itself — same model,
same planner, same tasks, adaptation on/off.

Usage (TPU, after the canonical campaign):
    python benchmarks/adaptation_gap.py [data/grbal/cripple_r3]
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

from experiment_utils.sim_policy import load_experiment, rollout  # noqa: E402


def main():
    exp_dir = sys.argv[1] if len(sys.argv) > 1 else 'data/grbal/cripple_r3'
    env, model, policy, config, adapt_bs = load_experiment(exp_dir)
    n, t = 5, 1000  # the canonical sampling shapes (reuse compiled programs)

    res = {}
    for label, bs in (('adapted', adapt_bs), ('pre-update', None)):
        rets = []
        for seed in (0, 1, 2):
            paths = rollout(env, policy, model, max_path_length=t,
                            num_rollouts=n, adapt_batch_size=bs, seed=seed)
            rets.extend(paths['rewards'].sum(axis=1).tolist())
        rets = np.asarray(rets)
        res[label] = rets
        print(f'{label}: mean {rets.mean():.1f} +- {rets.std():.1f} '
              f'(n={rets.size} rollouts x {t} steps, per-episode crippled '
              f'tasks)', flush=True)

    gap = res['adapted'].mean() - res['pre-update'].mean()
    rel = gap / max(abs(res['pre-update'].mean()), 1e-9) * 100
    print(f'adaptation gap: +{gap:.1f} return ({rel:+.0f}% vs pre-update)')
    tag = os.path.basename(os.path.normpath(exp_dir))
    out = os.path.join('results', f'adaptation_gap_{tag}.json')
    with open(out, 'w') as f:
        json.dump({k: dict(mean=float(v.mean()), std=float(v.std()),
                           n=int(v.size)) for k, v in res.items()}
                  | {'gap': float(gap)}, f, indent=2)
    print(f'wrote {out}')


if __name__ == '__main__':
    main()
