"""Golden-trajectory regression tests.

Records fixed-seed rollouts of every environment and compares against
committed golden files (tests/goldens/*.npz) — the trajectory-level
regression harness SURVEY.md section 4 calls for. Regenerate after an
*intentional* physics change:

    python tests/test_goldens.py --regen
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), 'goldens')

ENV_SPECS = [
    ('half_cheetah', 'HalfCheetahEnv', 'cripple'),
    ('ant', 'AntEnv', 'cripple'),
    ('half_cheetah_hfield', 'HalfCheetahHFieldEnv', 'hfield'),
    ('half_cheetah_blocks', 'HalfCheetahBlocksEnv', 'damping'),
    ('arm_7dof', 'Arm7DofEnv', 'force'),
]

N_STEPS = 40


def _rollout(name, cls_name, task):
    import learning_to_adapt_tpu.envs as envs
    env = getattr(envs, cls_name)(task=task, reset_every_episode=True)
    state = env.reset(jax.random.PRNGKey(123), episode_idx=1)
    stepf = jax.jit(env.step)
    key = jax.random.PRNGKey(7)
    qpos_hist, rew_hist = [], []
    for t in range(N_STEPS):
        key, sub = jax.random.split(key)
        act = jax.random.uniform(sub, (env.act_dim,), minval=-1.0,
                                 maxval=1.0)
        state, obs, reward, done, _ = stepf(state, act)
        qpos_hist.append(np.asarray(state.phys.qpos))
        rew_hist.append(float(reward))
    return np.stack(qpos_hist), np.asarray(rew_hist)


@pytest.mark.parametrize('name,cls,task', ENV_SPECS,
                         ids=[e[0] for e in ENV_SPECS])
def test_golden_trajectory(name, cls, task):
    path = os.path.join(GOLDEN_DIR, f'{name}.npz')
    if not os.path.exists(path):
        pytest.skip(f'no golden for {name}; run --regen')
    qpos, rew = _rollout(name, cls, task)
    gold = np.load(path)
    np.testing.assert_allclose(qpos, gold['qpos'], rtol=2e-3, atol=2e-4,
                               err_msg=f'{name} trajectory diverged from '
                               'golden (regen if intentional)')
    np.testing.assert_allclose(rew, gold['rewards'], rtol=2e-3, atol=2e-3)


if __name__ == '__main__':
    if '--regen' in sys.argv:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for name, cls, task in ENV_SPECS:
            qpos, rew = _rollout(name, cls, task)
            np.savez_compressed(os.path.join(GOLDEN_DIR, f'{name}.npz'),
                                qpos=qpos, rewards=rew)
            print(f'wrote golden for {name}: qpos {qpos.shape}')
