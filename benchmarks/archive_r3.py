"""Archive the round-3 canonical learning curves: copy each completed run's
progress.csv into results/<name>_r3.csv and render comparison plots.

Colors: validated categorical palette, fixed slot order (identity, never
cycled); one y-axis; recessive grid; legend for multi-series plots.
"""
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

RUNS = [
    # (exp dir, result name, label, categorical slot color)
    ('data/grbal/hc_r3', 'grbal_halfcheetah_tpu_r3', 'GrBAL', '#2a78d6'),
    ('data/rebal/hc_r3', 'rebal_halfcheetah_tpu_r3', 'ReBAL', '#eb6834'),
    ('data/mb_mpc/hc_r3', 'mb_mpc_halfcheetah_tpu_r3', 'MB-MPC', '#1baf7a'),
    ('data/grbal/cripple_r3', 'grbal_cheetah_cripple_tpu_r3',
     'GrBAL cripple', '#eda100'),
    ('data/grbal/hfield_r3', 'grbal_cheetah_hfield_tpu_r3',
     'GrBAL hfield', '#e87ba4'),
    ('data/mb_mpc/cripple_r3', 'mb_mpc_cheetah_cripple_tpu_r3',
     'MB-MPC cripple', '#008300'),
]


def load_curve(csv_path):
    import csv as csvmod
    with open(csv_path) as f:
        rows = list(csvmod.DictReader(f))
    itr = np.asarray([int(float(r['Itr'])) for r in rows])
    ret = np.asarray([float(r['EnvTrajs-AverageReturn']) for r in rows])
    order = np.argsort(itr)
    return itr[order], ret[order]


def main():
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    os.makedirs('results', exist_ok=True)
    curves = {}
    for exp_dir, name, label, color in RUNS:
        src = os.path.join(exp_dir, 'progress.csv')
        if not os.path.exists(src) or os.path.getsize(src) == 0:
            print(f'skip {label}: {src} missing/empty')
            continue
        dst = os.path.join('results', f'{name}.csv')
        shutil.copyfile(src, dst)
        curves[label] = (load_curve(dst), color)
        print(f'archived {dst} ({curves[label][0][0].size} iterations, '
              f'final return {curves[label][0][1][-5:].mean():.1f} '
              f'mean-of-last-5)')

    if not curves:
        return
    fig, ax = plt.subplots(figsize=(7.5, 4.5))
    for label, ((itr, ret), color) in curves.items():
        ax.plot(itr, ret, color=color, lw=2, label=label)
    ax.set_xlabel('Iteration')
    ax.set_ylabel('Average return')
    ax.set_title('Round-3 canonical runs on TPU (current engine)')
    ax.grid(alpha=0.25, lw=0.5)
    ax.legend(frameon=False, fontsize=9)
    fig.tight_layout()
    out = 'results/canonical_r3.png'
    fig.savefig(out, dpi=120)
    print(f'wrote {out}')


if __name__ == '__main__':
    main()
