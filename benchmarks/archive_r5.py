"""Archive the round-5 learning curves: copy each completed run's
progress.csv into results/<name>_r5*.csv and render the continuous-OOD
campaign plot (GrBAL vs MB-MPC trained on the {gentle,hill} terrain set,
plus the GrBAL blocks-damping runs) and the leave-one-out cheetah panel.

Colors: validated categorical palette, fixed slot order (identity, never
cycled); one y-axis; recessive grid; legend for multi-series plots.
"""
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

RUNS = [
    # (exp dir, result name, label, categorical slot color)
    ('data/grbal/cheetah_loo1_r5_s0', 'grbal_cheetah_loo1_tpu_r5',
     'GrBAL LOO act-1', '#2a78d6'),
    ('data/grbal/cheetah_loo2_r5_s0', 'grbal_cheetah_loo2_tpu_r5',
     'GrBAL LOO act-2', '#eb6834'),
    ('data/grbal/cheetah_loo3_r5_s0', 'grbal_cheetah_loo3_tpu_r5',
     'GrBAL LOO act-3', '#1baf7a'),
    ('data/grbal/cheetah_loo5_r5_s0', 'grbal_cheetah_loo5_tpu_r5',
     'GrBAL LOO act-5', '#8d6cdc'),
    ('data/grbal/cheetah_loo1_r5_s1', 'grbal_cheetah_loo1_tpu_r5_seed1',
     'GrBAL LOO act-1 s1', '#7fb2e8'),
    ('data/grbal/cheetah_loo2_r5_s1', 'grbal_cheetah_loo2_tpu_r5_seed1',
     'GrBAL LOO act-2 s1', '#f2a488'),
    ('data/grbal/cheetah_loo3_r5_s1', 'grbal_cheetah_loo3_tpu_r5_seed1',
     'GrBAL LOO act-3 s1', '#7ed0b0'),
    ('data/grbal/cheetah_loo5_r5_s1', 'grbal_cheetah_loo5_tpu_r5_seed1',
     'GrBAL LOO act-5 s1', '#c3b1ee'),
    ('data/grbal/hfield_holdout_r5_s0', 'grbal_hfield_holdout_tpu_r5',
     'GrBAL hfield {gentle,hill} s0', '#2a78d6'),
    ('data/grbal/hfield_holdout_r5_s1', 'grbal_hfield_holdout_tpu_r5_seed1',
     'GrBAL hfield {gentle,hill} s1', '#7fb2e8'),
    ('data/mb_mpc/hfield_holdout_r5_s0', 'mb_mpc_hfield_holdout_tpu_r5',
     'MB-MPC hfield {gentle,hill} s0', '#eb6834'),
    ('data/grbal/blocks_r5_s0', 'grbal_blocks_tpu_r5',
     'GrBAL blocks-damping s0', '#1baf7a'),
    ('data/grbal/blocks_r5_s1', 'grbal_blocks_tpu_r5_seed1',
     'GrBAL blocks-damping s1', '#7ed0b0'),
    # batch 8: ant leg leave-one-out (each trained with a different leg
    # held out of the cripple distribution)
    ('data/grbal/ant_loo0_r5_s0', 'grbal_ant_loo0_tpu_r5',
     'GrBAL ant LOO leg-0', '#2a78d6'),
    ('data/grbal/ant_loo1_r5_s0', 'grbal_ant_loo1_tpu_r5',
     'GrBAL ant LOO leg-1', '#eb6834'),
    ('data/grbal/ant_loo2_r5_s0', 'grbal_ant_loo2_tpu_r5',
     'GrBAL ant LOO leg-2', '#1baf7a'),
]

PLOT_TERRAIN = {'GrBAL hfield {gentle,hill} s0',
                'GrBAL hfield {gentle,hill} s1',
                'MB-MPC hfield {gentle,hill} s0',
                'GrBAL blocks-damping s0', 'GrBAL blocks-damping s1'}
PLOT_LOO = {'GrBAL LOO act-1', 'GrBAL LOO act-2', 'GrBAL LOO act-3',
            'GrBAL LOO act-5', 'GrBAL LOO act-1 s1', 'GrBAL LOO act-2 s1',
            'GrBAL LOO act-3 s1', 'GrBAL LOO act-5 s1'}
PLOT_ANT_LOO = {'GrBAL ant LOO leg-0', 'GrBAL ant LOO leg-1',
                'GrBAL ant LOO leg-2'}


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

    for plot_set, title, out in (
            (PLOT_TERRAIN, 'Round-5 continuous-OOD training '
             '(terrain set {gentle,hill}; blocks damping U(0,10))',
             'results/continuous_ood_r5.png'),
            (PLOT_LOO, 'Round-5 leave-one-out cheetah-cripple training',
             'results/cheetah_loo_r5.png'),
            (PLOT_ANT_LOO, 'Round-5 leave-one-out ant-cripple training',
             'results/ant_loo_r5.png')):
        plot = {k: v for k, v in curves.items() if k in plot_set}
        if not plot:
            continue
        fig, ax = plt.subplots(figsize=(7.5, 4.5))
        for label, ((itr, ret), color) in plot.items():
            ax.plot(itr, ret, color=color, lw=2, label=label)
        ax.set_xlabel('Iteration')
        ax.set_ylabel('Average return (training paths)')
        ax.set_title(title)
        ax.grid(alpha=0.25, lw=0.5)
        ax.legend(frameon=False, fontsize=9)
        fig.tight_layout()
        fig.savefig(out, dpi=120)
        print(f'wrote {out}')


if __name__ == '__main__':
    main()
