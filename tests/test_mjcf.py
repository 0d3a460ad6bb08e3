"""MJCF loader tests: parse the reference benchmark XMLs (read-only mount)
and cross-validate against the programmatic model definitions — sizes,
masses, joint addressing, actuator gears, collision pair structure."""
import os

import numpy as np
import pytest

from learning_to_adapt_tpu.envs.model_defs import get_model
from learning_to_adapt_tpu.physics.mjcf import load_mjcf

REF_ASSETS = '/root/reference/learning_to_adapt/envs/assets'

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ASSETS),
    reason='reference assets not mounted')

CASES = [
    ('half_cheetah.xml', 'half_cheetah'),
    ('ant.xml', 'ant'),
    ('half_cheetah_blocks.xml', 'half_cheetah_blocks'),
    ('arm_7dof.xml', 'arm_7dof'),
    ('half_cheetah_hfield.xml', 'half_cheetah_hfield'),
]


@pytest.mark.parametrize('xml,name', CASES, ids=[c[1] for c in CASES])
def test_xml_matches_programmatic_model(xml, name):
    ref = load_mjcf(os.path.join(REF_ASSETS, xml))
    ours = get_model(name)
    assert ref.nq == ours.nq
    assert ref.nv == ours.nv
    assert ref.nu == ours.nu
    assert ref.nbody == ours.nbody
    assert ref.ngeom == ours.ngeom
    np.testing.assert_allclose(ref.body_mass0, ours.body_mass0, rtol=1e-6)
    np.testing.assert_allclose(ref.body_pos, ours.body_pos, atol=1e-10)
    np.testing.assert_allclose(ref.jnt_axis, ours.jnt_axis, atol=1e-7)
    np.testing.assert_allclose(ref.jnt_range, ours.jnt_range, atol=1e-6)
    np.testing.assert_allclose(ref.dof_damping0, ours.dof_damping0,
                               atol=1e-10)
    np.testing.assert_allclose(ref.dof_armature, ours.dof_armature,
                               atol=1e-10)
    np.testing.assert_allclose(ref.act_gear, ours.act_gear, atol=1e-10)
    np.testing.assert_allclose(ref.act_ctrlrange, ours.act_ctrlrange,
                               atol=1e-10)
    np.testing.assert_allclose(ref.geom_size0, ours.geom_size0, atol=1e-9)
    np.testing.assert_allclose(ref.body_inertia, ours.body_inertia,
                               rtol=1e-5, atol=1e-10)
    assert ref.timestep == ours.timestep
    assert ref.integrator == ours.integrator
    # same collision pair structure
    ref_pairs = {k: v.shape for k, v in ref.pair_groups}
    our_pairs = {k: v.shape for k, v in ours.pair_groups}
    assert ref_pairs == our_pairs
    if ref.init_qpos is not None or ours.init_qpos is not None:
        np.testing.assert_allclose(ref.init_qpos, ours.init_qpos,
                                   atol=1e-10)


def test_xml_model_steps():
    """A model loaded from XML must actually simulate."""
    import jax
    import jax.numpy as jnp
    from learning_to_adapt_tpu.physics import (
        PhysicsState, default_mutable, step)
    model = load_mjcf(os.path.join(REF_ASSETS, 'half_cheetah.xml'))
    mm = default_mutable(model)
    s = PhysicsState(qpos=jnp.asarray(model.qpos0, jnp.float32),
                     qvel=jnp.zeros(model.nv, jnp.float32))
    stepf = jax.jit(lambda s: step(model, mm, s, jnp.zeros(model.nu)))
    for _ in range(20):
        s = stepf(s)
    assert np.isfinite(np.asarray(s.qpos)).all()
