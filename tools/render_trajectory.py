"""Offline trajectory renderer (replaces the reference's GLFW/OpenGL MjViewer
stack, reference mujoco_py/mjviewer.py — which is replay tooling only, never
on the training path, SURVEY.md section 2.1).

Reads a replay .npz (from experiment_utils/sim_policy.py) and renders the
articulated body as a 2-D stick figure strip (x-z plane; capsule segments
from forward kinematics) to PNG frames or an animated GIF.

Usage:
    python tools/render_trajectory.py data/grbal/replay.npz --env half_cheetah
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np  # noqa: E402


def render_frames(qpos_seq, model, stride=20):
    """Returns a list of (segments, spheres) per frame: world-space capsule
    endpoints / sphere centers from FK."""
    import jax.numpy as jnp
    from learning_to_adapt_tpu.physics import engine, spec
    from learning_to_adapt_tpu.physics.spec import default_mutable

    mm = default_mutable(model)
    frames = []
    for qpos in qpos_seq[::stride]:
        xpos, xquat, _ = engine._fk(model, mm,
                                    jnp.asarray(qpos, jnp.float32))
        from learning_to_adapt_tpu.physics import maths
        ximat = maths.quat_to_mat(xquat)
        gpos, gmat = engine._geom_frames(model, mm, xpos, ximat)
        gpos = np.asarray(gpos)
        gmat = np.asarray(gmat)
        segs, spheres = [], []
        for gi in range(model.ngeom):
            t = int(model.geom_type[gi])
            size = model.geom_size0[gi]
            if t == spec.CAPSULE:
                axis = gmat[gi][:, 2]
                e1 = gpos[gi] + axis * size[1]
                e2 = gpos[gi] - axis * size[1]
                segs.append((e1, e2, size[0]))
            elif t == spec.SPHERE:
                spheres.append((gpos[gi], size[0]))
            elif t == spec.BOX:
                half = size
                e1 = gpos[gi] + gmat[gi][:, 0] * half[0]
                e2 = gpos[gi] - gmat[gi][:, 0] * half[0]
                segs.append((e1, e2, half[2]))
        frames.append((segs, spheres))
    return frames


def main():
    p = argparse.ArgumentParser()
    p.add_argument('replay', type=str)
    p.add_argument('--env', type=str, default='half_cheetah')
    p.add_argument('--rollout', type=int, default=0)
    p.add_argument('--stride', type=int, default=25)
    p.add_argument('--out', type=str, default=None)
    args = p.parse_args()

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    from learning_to_adapt_tpu.envs.model_defs import get_model
    model = get_model(args.env)
    data = np.load(args.replay)
    qpos_seq = data['qpos'][args.rollout]
    frames = render_frames(qpos_seq, model, stride=args.stride)

    n = len(frames)
    cols = min(n, 8)
    rows = (n + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(2.2 * cols, 2.2 * rows))
    axes = np.atleast_1d(axes).ravel()
    for ax in axes:
        ax.axis('off')
    for i, (segs, spheres) in enumerate(frames):
        ax = axes[i]
        for e1, e2, r in segs:
            ax.plot([e1[0], e2[0]], [e1[2], e2[2]], lw=max(r * 40, 1),
                    solid_capstyle='round', color='tab:brown')
        for c, r in spheres:
            ax.add_patch(plt.Circle((c[0], c[2]), r, color='tab:orange'))
        ax.axhline(0, color='gray', lw=0.5)
        ax.set_aspect('equal')
        ax.set_xlim(qpos_seq[:, 0].min() - 1, qpos_seq[:, 0].max() + 1)
        ax.set_ylim(-0.2, 1.6)
        ax.set_title(f't={i * args.stride}', fontsize=7)
    out = args.out or args.replay.replace('.npz', '.png')
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    print(f'wrote {out} ({n} frames)')


if __name__ == '__main__':
    main()
