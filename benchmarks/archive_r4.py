"""Archive the round-4 learning curves: copy each completed run's
progress.csv into results/<name>_r4*.csv and render the Ant meta-test
campaign plot (GrBAL vs MB-MPC on the crippled-leg train distribution)
plus the second-seed runs.

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
    ('data/grbal/ant_cripple_r4_s0', 'grbal_ant_cripple_tpu_r4',
     'GrBAL Ant-cripple s0', '#2a78d6'),
    ('data/grbal/ant_cripple_r4_s1', 'grbal_ant_cripple_tpu_r4_seed1',
     'GrBAL Ant-cripple s1', '#7fb2e8'),
    ('data/mb_mpc/ant_cripple_r4_s0', 'mb_mpc_ant_cripple_tpu_r4',
     'MB-MPC Ant-cripple s0', '#eb6834'),
    ('data/mb_mpc/ant_cripple_r4_s1', 'mb_mpc_ant_cripple_tpu_r4_seed1',
     'MB-MPC Ant-cripple s1', '#f2a488'),
    ('data/grbal/cheetah_holdout_r4_s0', 'grbal_cheetah_holdout_tpu_r4',
     'GrBAL cheetah-holdout s0', '#1baf7a'),
    ('data/grbal/cheetah_holdout_r4_s1',
     'grbal_cheetah_holdout_tpu_r4_seed1',
     'GrBAL cheetah-holdout s1', '#7ed0b0'),
    ('data/mb_mpc/cheetah_holdout_r4_s0', 'mb_mpc_cheetah_holdout_tpu_r4',
     'MB-MPC cheetah-holdout s0', '#eda100'),
    ('data/grbal/hfield_r4_s1', 'grbal_cheetah_hfield_tpu_r4_seed1',
     'GrBAL hfield s1', '#e87ba4'),
    ('data/grbal/arm_r4_s1', 'grbal_arm7dof_tpu_r4_seed1',
     'GrBAL Arm7DoF s1', '#008300'),
    ('data/mb_mpc/blocks_r4_s1', 'mb_mpc_blocks_tpu_r4_seed1',
     'MB-MPC Blocks s1', '#8d6cdc'),
    ('data/rebal/ant_cripple_r4_s1', 'rebal_ant_cripple_tpu_r4_seed1',
     'ReBAL Ant-cripple s1', '#b8860b'),
    # third ant seeds (post-campaign batch)
    ('data/grbal/ant_cripple_r4_s2', 'grbal_ant_cripple_tpu_r4_seed2',
     'GrBAL Ant-cripple s2', '#174e8c'),
    ('data/mb_mpc/ant_cripple_r4_s2', 'mb_mpc_ant_cripple_tpu_r4_seed2',
     'MB-MPC Ant-cripple s2', '#a34418'),
    ('data/rebal/ant_cripple_r4_s2', 'rebal_ant_cripple_tpu_r4_seed2',
     'ReBAL Ant-cripple s2', '#8a6508'),
]

PLOT = {'GrBAL Ant-cripple s0', 'GrBAL Ant-cripple s1',
        'GrBAL Ant-cripple s2', 'MB-MPC Ant-cripple s0',
        'MB-MPC Ant-cripple s1', 'MB-MPC Ant-cripple s2'}


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

    plot = {k: v for k, v in curves.items() if k in PLOT}
    if not plot:
        return
    fig, ax = plt.subplots(figsize=(7.5, 4.5))
    for label, ((itr, ret), color) in plot.items():
        ax.plot(itr, ret, color=color, lw=2, label=label)
    ax.set_xlabel('Iteration')
    ax.set_ylabel('Average return (training paths)')
    ax.set_title('Round-4 Ant-cripple training (legs 0-2; leg 3 held out)')
    ax.grid(alpha=0.25, lw=0.5)
    ax.legend(frameon=False, fontsize=9)
    fig.tight_layout()
    out = 'results/ant_cripple_r4.png'
    fig.savefig(out, dpi=120)
    print(f'wrote {out}')


if __name__ == '__main__':
    main()
