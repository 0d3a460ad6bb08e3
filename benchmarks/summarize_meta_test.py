"""Aggregate results/meta_test_*.json into the markdown meta-test table
for docs/PARITY.md (and a combined-gap estimate pooled across GrBAL
training seeds)."""
import glob
import json
import sys

import numpy as np


def fmt(v):
    return f"{v['mean']:.1f} ± {v['sem']:.1f}"


def main(pattern='results/meta_test_*.json'):
    rows = []
    gaps = []
    for f in sorted(glob.glob(pattern)):
        if 'smoke' in f or '_sweeps' in f:
            # _sweeps files are preserved pass-1 copies of snapshots that
            # were re-evaluated with more seeds — counting both would
            # double-weight those snapshots
            continue
        d = json.load(open(f))
        tag = f.split('meta_test_')[1][:-5]
        for mode in ('adapted', 'pre-update', 'mb_mpc'):
            if mode in d:
                rows.append((tag, d['train_set'], d['eval_set'], mode,
                             d[mode]))
        if 'gap' in d:
            gaps.append((tag, d['gap']))
    print('| snapshot | train set | eval set | mode | return |')
    print('|---|---|---|---|---|')
    for tag, tr, ev, mode, v in rows:
        print(f'| {tag} | {tr} | {ev} | {mode} | {fmt(v)} |')
    print()
    for tag, g in gaps:
        print(f'gap {tag}: {g["mean"]:+.1f} ± {g["sem"]:.1f}')
    ood = [g for t, g in gaps if 'leg3' in t or 'act4' in t]
    if ood:
        means = np.array([g['mean'] for g in ood])
        sems = np.array([g['sem'] for g in ood])
        pooled_sem = np.sqrt(np.sum(sems ** 2)) / len(ood)
        print(f'\npooled OOD adaptation gap ({len(ood)} snapshots): '
              f'{means.mean():+.1f} ± {pooled_sem:.1f}')


if __name__ == '__main__':
    main(*sys.argv[1:])
