"""Native C++ oracle vs jitted JAX engine, step-for-step in float64.

The oracle (native/ltao_physics.cc) is an independent implementation of the
same articulated-body pipeline; agreement to ~1e-6 over multi-step rollouts
is the trajectory-level validation the reference delegated to the closed
MuJoCo C library (reference mujoco_py/mjlib.py:8-17, SURVEY.md section 7.4
item 2)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from learning_to_adapt_tpu.envs.model_defs import (
    ant_spec, arm_7dof_spec, half_cheetah_blocks_spec, half_cheetah_spec,
    half_cheetah_hfield_spec)
from learning_to_adapt_tpu.physics import engine
from learning_to_adapt_tpu.physics.engine import PhysicsState
from learning_to_adapt_tpu.physics.spec import compile_spec, default_mutable

native = pytest.importorskip('learning_to_adapt_tpu.native')
if not native.available():
    pytest.skip('native oracle unavailable (no g++?)', allow_module_level=True)


@pytest.fixture(autouse=True)
def _x64_mode():
    old = jax.config.jax_enable_x64
    jax.config.update('jax_enable_x64', True)
    yield
    jax.config.update('jax_enable_x64', old)


def _random_state(model, seed):
    rng = np.random.RandomState(seed)
    qpos = np.array(model.qpos0 if model.init_qpos is None
                    else model.init_qpos, np.float64)
    qpos = qpos + rng.uniform(-0.01, 0.01, model.nq)
    for ji in range(model.njnt):
        if model.jnt_type[ji] == 0:  # FREE: renormalize the quaternion
            a = model.jnt_qposadr[ji] + 3
            qpos[a:a + 4] /= np.linalg.norm(qpos[a:a + 4])
    qvel = rng.uniform(-0.1, 0.1, model.nv)
    ctrl = rng.uniform(-1, 1, max(model.nu, 1))[:model.nu]
    return qpos, qvel, ctrl


def _compare(spec, n_steps, tol_p, tol_v, seed=0, mm_edit=None):
    model = compile_spec(spec)
    mm = default_mutable(model, np.float64)
    if mm_edit is not None:
        mm = mm_edit(mm)
    nat = native.NativePhysics(model)
    qpos, qvel, ctrl = _random_state(model, seed)

    mm_j = jax.tree.map(jnp.asarray, mm)
    step_j = jax.jit(lambda s, c: engine.step(model, mm_j, s, c))
    sj = PhysicsState(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel))
    qp, qv = qpos.copy(), qvel.copy()
    for _ in range(n_steps):
        sj = step_j(sj, jnp.asarray(ctrl))
        qp, qv = nat.step(qp, qv, ctrl, mm)
    np.testing.assert_allclose(np.asarray(sj.qpos), qp, atol=tol_p)
    np.testing.assert_allclose(np.asarray(sj.qvel), qv, atol=tol_v)
    return model, mm, sj, nat


class TestOracleParity:
    def test_half_cheetah_trajectory(self):
        """Euler + hinge/slide joints + plane/capsule contacts."""
        _compare(half_cheetah_spec(), 50, 1e-6, 1e-5)

    def test_arm_trajectory(self):
        """Zero-g Euler arm (limits, no contacts on the nominal path)."""
        _compare(arm_7dof_spec(), 50, 1e-6, 1e-5)

    def test_forward_parity(self):
        model, mm, sj, nat = _compare(half_cheetah_spec(), 10, 1e-7, 1e-6)
        fj = engine.forward(model, jax.tree.map(jnp.asarray, mm), sj)
        fn = nat.forward(np.asarray(sj.qpos), np.asarray(sj.qvel), mm)
        for k in ('xpos', 'ximat', 'subtree_com', 'subtree_comvel'):
            np.testing.assert_allclose(
                np.asarray(getattr(fj, k)), fn[k], atol=1e-7)


class TestOracleParityAnt:
    def test_ant_trajectory(self):
        """RK4 + free joint + sphere/capsule-plane contacts — the hard case
        (SURVEY.md 7.4 item 1)."""
        _compare(ant_spec(), 25, 1e-5, 1e-4)


class TestOracleParityTerrains:
    def test_hfield_trajectory(self):
        """Capsule-heightfield contacts over a bumpy x-profile (the hfield
        task surface, reference half_cheetah_hfield_env.py:76-166)."""
        import dataclasses
        rng = np.random.RandomState(3)

        def bumpy(mm):
            ncol = mm.hfield_row.shape[0]
            row = np.clip(np.cumsum(rng.uniform(-.05, .05, ncol)), 0, 1)
            return dataclasses.replace(mm, hfield_row=row.astype(np.float64))

        _compare(half_cheetah_hfield_spec(), 40, 1e-6, 1e-5, mm_edit=bumpy)

    def test_blocks_trajectory(self):
        """Capsule-box contacts on the spring-loaded block floor (reference
        half_cheetah_blocks_env.py, assets/half_cheetah_blocks.xml:54-90)."""
        _compare(half_cheetah_blocks_spec(), 40, 1e-6, 1e-5)
