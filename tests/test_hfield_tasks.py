"""Heightfield task-generation parity: the closed-form ramp profile must
reproduce the reference's cumsum-and-propagate construction
(half_cheetah_hfield_env.py:84-96)."""
import jax
import jax.numpy as jnp
import numpy as np

from learning_to_adapt_tpu.envs import HalfCheetahHFieldEnv


def reference_profile(x_walls, height_walls, width, n=500):
    """Direct transcription of the reference loop semantics."""
    row = np.zeros((n,))
    for i, x in enumerate(x_walls):
        x = int(x)
        terrain = np.cumsum([height_walls[i]] * width)
        row[x:x + width] += terrain
        row[x + width:] = row[x + width - 1]
    row = (row - np.min(row)) / (np.max(row) - np.min(row))
    return row


def test_profile_matches_reference_construction():
    env = HalfCheetahHFieldEnv(task='hfield')
    walls = np.array([255., 265., 275., 285., 295., 305.])
    heights = np.array([0.3, 0.5, -0.2, 0.4, -0.3, 0.25])
    ours = np.asarray(env._profile(jnp.asarray(walls, jnp.float32),
                                   jnp.asarray(heights, jnp.float32), 10.0))
    ref = reference_profile(walls, heights, 10)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_fixed_variants_profiles():
    for task in ('basin', 'hill', 'gentle', 'steep'):
        env = HalfCheetahHFieldEnv(task=task)
        mm, _ = env.sample_task(jax.random.PRNGKey(0), env.mm0,
                                env.default_task())
        row = np.asarray(mm.hfield_row)
        assert row.min() == 0.0 and abs(row.max() - 1.0) < 1e-6
        # reference constructions for the deterministic variants
        fixed = {
            'basin': ([-1., 1., 0., 0., 0., 0.], 0.55),
            'hill': ([1., -1., 0., 0., 0., 0.], 0.6),
            'gentle': ([1., 1., 1., 1., 1., 1.], 1.0),
            'steep': ([1., 1., 1., 1., 1., 1.], 4.0),
        }[task]
        ref = reference_profile(np.array([250, 265, 280, 295, 310, 325]),
                                np.array(fixed[0]), 15)
        np.testing.assert_allclose(row, ref, atol=1e-5)
        assert abs(float(mm.hfield_size[2]) - fixed[1]) < 1e-6


def test_random_hfield_statistics():
    env = HalfCheetahHFieldEnv(task='hfield')
    heights = []
    for i in range(20):
        mm, _ = env.sample_task(jax.random.PRNGKey(i), env.mm0,
                                env.default_task())
        heights.append(float(mm.hfield_size[2]))
    heights = np.asarray(heights)
    assert (heights >= 0.2).all() and (heights <= 1.0).all()
    assert heights.std() > 0.05  # actually random
