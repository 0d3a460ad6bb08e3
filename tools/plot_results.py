"""Offline results viewer (viskit equivalent, reference viskit/frontend.py).

Walks experiment directories for progress.csv + params.json, groups runs by
the hyperparameters that differ (reference viskit/core.py:134-164), and
plots mean curves with min/max bands per group to a PNG (headless; no Flask
server needed — point it at data/ and open the image).

Usage:
    python tools/plot_results.py data/grbal [--y EnvTrajs-AverageReturn]
        [--x Itr] [--out plot.png]
"""
import argparse
import csv
import json
import os
from collections import defaultdict


def load_progress(path):
    with open(path) as f:
        reader = csv.DictReader(f)
        rows = list(reader)
    cols = defaultdict(list)
    for row in rows:
        for k, v in row.items():
            try:
                cols[k].append(float(v))
            except (TypeError, ValueError):
                cols[k].append(float('nan'))
    return {k: v for k, v in cols.items()}


def find_experiments(root):
    exps = []
    for dirpath, _, files in os.walk(root):
        if 'progress.csv' in files:
            params = {}
            pj = os.path.join(dirpath, 'params.json')
            if os.path.exists(pj):
                with open(pj) as f:
                    params = json.load(f)
            exps.append((dirpath,
                         load_progress(os.path.join(dirpath,
                                                    'progress.csv')),
                         params))
    return exps


def group_key(params, varying):
    return tuple(str(params.get(k)) for k in varying)


def varying_params(exps):
    """Keys whose values differ across experiments (the viskit grouping
    rule)."""
    all_keys = set()
    for _, _, p in exps:
        all_keys.update(p.keys())
    varying = []
    for k in sorted(all_keys):
        vals = {json.dumps(p.get(k), sort_keys=True, default=str)
                for _, _, p in exps}
        if len(vals) > 1 and k != 'exp_name':
            varying.append(k)
    return varying


def main():
    p = argparse.ArgumentParser()
    p.add_argument('root', type=str)
    p.add_argument('--y', type=str, default='EnvTrajs-AverageReturn')
    p.add_argument('--x', type=str, default='Itr')
    p.add_argument('--out', type=str, default='plot.png')
    args = p.parse_args()

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    import numpy as np

    exps = find_experiments(args.root)
    if not exps:
        print(f'no progress.csv found under {args.root}')
        return
    varying = varying_params(exps)
    groups = defaultdict(list)
    for dirpath, prog, params in exps:
        groups[group_key(params, varying)].append((dirpath, prog))

    fig, ax = plt.subplots(figsize=(8, 5))
    for key, runs in sorted(groups.items()):
        curves = []
        for _, prog in runs:
            if args.y in prog and args.x in prog:
                curves.append((np.asarray(prog[args.x]),
                               np.asarray(prog[args.y])))
        if not curves:
            continue
        n = min(len(c[1]) for c in curves)
        xs = curves[0][0][:n]
        ys = np.stack([c[1][:n] for c in curves])
        label = ', '.join(f'{k}={v}' for k, v in zip(varying, key)) or 'run'
        ax.plot(xs, np.nanmean(ys, axis=0), label=label)
        if len(curves) > 1:
            ax.fill_between(xs, np.nanmin(ys, axis=0), np.nanmax(ys, axis=0),
                            alpha=0.2)
    ax.set_xlabel(args.x)
    ax.set_ylabel(args.y)
    ax.legend(fontsize=8)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f'wrote {args.out} ({len(exps)} runs, {len(groups)} groups)')


if __name__ == '__main__':
    main()
