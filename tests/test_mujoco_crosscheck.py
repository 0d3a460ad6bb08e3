"""Cross-validation of the physics engine against open-source MuJoCo.

The round-1 oracle (native/ltao_physics.cc) is op-for-op the same algorithm
as engine.py, so it catches drift but not shared divergence from MuJoCo
semantics. These tests ground the engine in the real thing: they load the
ORIGINAL reference XMLs (/root/reference/learning_to_adapt/envs/assets/*.xml,
the exact files the reference trains on via mujoco_py mjcore.py:35) with the
`mujoco` package and compare trajectories step for step in float64.

Measured agreement driving the tolerances below (100-step rollouts, random
ctrl, converged solver): half_cheetah 1.2e-5, ant 1.2e-11, arm_7dof 4e-12,
half_cheetah_blocks 2.8e-3.

Known deltas vs modern MuJoCo (documented in docs/PARITY.md):
- solver: we run projected Jacobi/PGS on the same convex problem MuJoCo's
  Newton solves; converged results agree, production settings are looser.
- box-box: 4-point SAT face manifold vs MuJoCo's mjc_BoxBox - same face
  normals, slightly different manifold points (blocks env ~1e-3/step).
- capsule-box: 2 endpoint-sphere contacts vs MuJoCo's exact capsule-box.
- MuJoCo 1.31 (the reference's pinned version) cannot be installed here;
  modern MuJoCo is the closest executable ground truth.
"""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

mujoco = pytest.importorskip('mujoco')

from learning_to_adapt_tpu.envs import model_defs
from learning_to_adapt_tpu.physics import engine
from learning_to_adapt_tpu.physics.engine import PhysicsState
from learning_to_adapt_tpu.physics.spec import (
    BodySpec, GeomSpec, HFieldSpec, JointSpec, ModelSpec, OptionSpec,
    compile_spec, default_mutable, FREE, HFIELD, CAPSULE, PLANE)

ASSETS = '/root/reference/learning_to_adapt/envs/assets'


@pytest.fixture(autouse=True)
def _x64_mode():
    old = jax.config.jax_enable_x64
    jax.config.update('jax_enable_x64', True)
    yield
    jax.config.update('jax_enable_x64', old)


def _mj_model(name):
    return mujoco.MjModel.from_xml_path(os.path.join(ASSETS, f'{name}.xml'))


def _init_state(model, seed):
    rng = np.random.RandomState(seed)
    qpos = np.array(model.qpos0 if model.init_qpos is None
                    else model.init_qpos, np.float64)
    qpos = qpos + rng.uniform(-0.01, 0.01, model.nq)
    for ji in range(model.njnt):
        if model.jnt_type[ji] == FREE:
            a = model.jnt_qposadr[ji] + 3
            qpos[a:a + 4] /= np.linalg.norm(qpos[a:a + 4])
    qvel = rng.uniform(-0.1, 0.1, model.nv)
    return qpos, qvel, rng


def _compare_traj(name, n_steps, tol, amp=0.3, converged=True, seed=0):
    model = compile_spec(getattr(model_defs, f'{name}_spec')())
    if converged:
        model = dataclasses.replace(model, iterations=100, solver='pgs')
    mm = jax.tree.map(jnp.asarray, default_mutable(model, np.float64))
    mj = _mj_model(name)
    d = mujoco.MjData(mj)

    qpos, qvel, rng = _init_state(model, seed)
    ctrls = rng.uniform(-amp, amp, (n_steps, max(model.nu, 1)))[:, :model.nu]

    d.qpos[:] = qpos
    d.qvel[:] = qvel
    mq = []
    for t in range(n_steps):
        d.ctrl[:] = ctrls[t]
        mujoco.mj_step(mj, d)
        mq.append(d.qpos.copy())

    stepf = jax.jit(lambda s, c: engine.step(model, mm, s, c))
    s = PhysicsState(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel))
    eq = []
    for t in range(n_steps):
        s = stepf(s, jnp.asarray(ctrls[t]))
        eq.append(np.asarray(s.qpos))

    err = np.abs(np.stack(eq) - np.stack(mq)).max()
    assert err < tol, f'{name}: max |qpos| divergence {err:.3e} >= {tol}'
    return err


class TestModelConstants:
    """Compile-time model quantities vs MuJoCo's own compiler."""

    @pytest.mark.parametrize('name', ['half_cheetah', 'ant', 'arm_7dof',
                                      'half_cheetah_blocks',
                                      'half_cheetah_hfield'])
    def test_constants(self, name):
        model = compile_spec(getattr(model_defs, f'{name}_spec')())
        mj = _mj_model(name)
        assert (model.nq, model.nv, model.nu) == (mj.nq, mj.nv, mj.nu)
        np.testing.assert_allclose(model.qpos0, mj.qpos0, atol=1e-12)
        # inertiafromgeom mass pipeline (incl. settotalmass rescale)
        np.testing.assert_allclose(model.body_mass0, mj.body_mass,
                                   atol=1e-9)
        # mj_setConst invweights drive the constraint regularizer R
        np.testing.assert_allclose(model.dof_invweight0, mj.dof_invweight0,
                                   rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(model.body_invweight0,
                                   mj.body_invweight0[:, 0],
                                   rtol=1e-9, atol=1e-12)


class TestEnergy:
    """mj_energy parity (the reference calls mj_sensor+mj_energy in every
    forward, mjcore.py:50-51; no reference model defines sensors, so
    energy is that pair's only observable)."""

    @pytest.mark.parametrize('name', ['half_cheetah', 'ant',
                                      'half_cheetah_blocks'])
    def test_energy_matches_mujoco(self, name):
        model = compile_spec(getattr(model_defs, f'{name}_spec')())
        mm = jax.tree.map(jnp.asarray, default_mutable(model, np.float64))
        mj = _mj_model(name)
        mj.opt.enableflags |= mujoco.mjtEnableBit.mjENBL_ENERGY
        d = mujoco.MjData(mj)
        for seed in range(3):
            qpos, qvel, _ = _init_state(model, seed)
            d.qpos[:] = qpos
            d.qvel[:] = qvel
            mujoco.mj_forward(mj, d)
            pot, kin = engine.energy(
                model, mm, PhysicsState(qpos=jnp.asarray(qpos),
                                        qvel=jnp.asarray(qvel)))
            np.testing.assert_allclose(float(pot), d.energy[0], rtol=1e-9,
                                       atol=1e-9)
            np.testing.assert_allclose(float(kin), d.energy[1], rtol=1e-9,
                                       atol=1e-9)


class TestContactFree:
    """Tight parity where no contact force is in play."""

    def test_cheetah_airborne_exact(self):
        """Smooth dynamics (FK/CRBA/RNE/actuation/implicit-damping Euler)
        match to machine precision while the cheetah is in flight."""
        model = compile_spec(model_defs.half_cheetah_spec())
        mm = jax.tree.map(jnp.asarray, default_mutable(model, np.float64))
        mj = _mj_model('half_cheetah')
        d = mujoco.MjData(mj)
        qpos, qvel, rng = _init_state(model, 0)
        qpos[1] += 1.0  # rootz: lift well above the floor
        ctrls = rng.uniform(-0.5, 0.5, (10, model.nu))
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        stepf = jax.jit(lambda s, c: engine.step(model, mm, s, c))
        s = PhysicsState(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel))
        for t in range(10):
            d.ctrl[:] = ctrls[t]
            mujoco.mj_step(mj, d)
            s = stepf(s, jnp.asarray(ctrls[t]))
            np.testing.assert_allclose(np.asarray(s.qpos), d.qpos,
                                       atol=1e-14)

    def test_arm_trajectory(self):
        """Zero-g arm with active joint limits: the limit constraint model
        (impedance power curve, tc >= 2*dt clamp, dof_invweight0 R)."""
        _compare_traj('arm_7dof', 50, 1e-9)


class TestContactTrajectories:
    """Converged-solver trajectory parity with contacts and friction."""

    def test_half_cheetah(self):
        """Capsule-plane contacts, pyramidal friction, settotalmass."""
        _compare_traj('half_cheetah', 50, 1e-4)

    def test_ant_rk4(self):
        """RK4 + free joint + margin-mixed contacts + capsule-axis contact
        frames: the hardest case, and it matches to ~1e-11."""
        _compare_traj('ant', 50, 1e-8)

    def test_blocks(self):
        """Box-box (SAT manifold) and capsule-box contacts."""
        _compare_traj('half_cheetah_blocks', 50, 1e-2)

    def test_ant_production_solver(self):
        """The jacobi solver the TPU path actually runs (adaptive omega),
        vs MuJoCo's Newton: statistical-level agreement."""
        _compare_traj('ant', 50, 2e-3, converged=False)


class TestProductionSolver:
    """Trajectory parity under the SHIPPING solver settings (adaptive
    Jacobi at model-default iterations) — the exact configuration the
    training rollouts run, not the converged-PGS laboratory setting.
    Bounds are 5-10x over the measured max across seeds 0-2 (measured:
    cheetah 1.8e-4, blocks 1.9e-4, arm 2.0e-11 over 50 steps)."""

    @pytest.mark.parametrize('seed', [0, 1, 2])
    def test_half_cheetah(self, seed):
        _compare_traj('half_cheetah', 50, 1e-3, converged=False, seed=seed)

    @pytest.mark.parametrize('seed', [0, 1, 2])
    def test_blocks(self, seed):
        _compare_traj('half_cheetah_blocks', 50, 2e-3, converged=False,
                      seed=seed)

    @pytest.mark.parametrize('seed', [0, 1, 2])
    def test_arm(self, seed):
        _compare_traj('arm_7dof', 50, 1e-9, converged=False, seed=seed)


class TestF32Drift:
    """Bound the TPU-dtype (float32) drift of the shipping engine vs the
    float64 trajectory of the SAME engine: the validated-f64 configuration
    and the trained-f32 configuration agree to well under physical noise
    (measured 50-step max: cheetah 7e-8, ant 1.6e-7, arm 1.8e-4)."""

    @pytest.mark.parametrize('name,tol', [('half_cheetah', 1e-5),
                                          ('ant', 1e-5),
                                          ('arm_7dof', 2e-3)])
    def test_f32_matches_f64(self, name, tol):
        model = compile_spec(getattr(model_defs, f'{name}_spec')())
        qpos, qvel, rng = _init_state(model, 0)
        ctrls = rng.uniform(-0.3, 0.3, (50, max(model.nu, 1)))[:, :model.nu]

        def run(dtype):
            mm = jax.tree.map(
                lambda x: jnp.asarray(np.asarray(x, dtype)),
                default_mutable(model, np.float64))
            stepf = jax.jit(lambda s, c: engine.step(model, mm, s, c))
            s = PhysicsState(qpos=jnp.asarray(qpos, dtype),
                             qvel=jnp.asarray(qvel, dtype))
            out = []
            for t in range(50):
                s = stepf(s, jnp.asarray(ctrls[t], dtype))
                out.append(np.asarray(s.qpos, np.float64))
            return np.stack(out)

        t64 = run(jnp.float64)
        # f32 leg under x64=off — the production numeric environment
        jax.config.update('jax_enable_x64', False)
        try:
            t32 = run(jnp.float32)
        finally:
            jax.config.update('jax_enable_x64', True)
        err = np.abs(t64 - t32).max()
        assert err < tol, f'{name}: f32 drift {err:.3e} >= {tol}'


class TestRealTerrain:
    """Cheetah on the REAL hfield env terrain vs MuJoCo loading the actual
    reference half_cheetah_hfield.xml: the env's own task generator writes
    the identical 500-sample profile into MutableModel.hfield_row and
    mj.hfield_data (tiled across rows — every reference terrain is constant
    along y, half_cheetah_hfield_env.py:76-166), and full trajectories are
    compared under both converged and shipping solver settings.

    Smooth tasks (hill/gentle) track to 1.2e-2/2.7e-2 over 50 steps
    (measured). The cliff-edge tasks (basin, random 'hfield') diverge at
    the first rim-contact event — a chaotic branch, not model error; kink
    normals are covered by TestHField's controlled-grid test."""

    @pytest.mark.parametrize('task,production', [
        ('hill', False), ('hill', True),
        ('gentle', False), ('gentle', True)])
    def test_real_terrain_trajectory(self, task, production):
        from learning_to_adapt_tpu.envs.half_cheetah import (
            HalfCheetahHFieldEnv)

        env = HalfCheetahHFieldEnv(task=task)
        model = env.model
        if not production:
            model = dataclasses.replace(model, iterations=100, solver='pgs')
        mm = jax.tree.map(lambda x: jnp.asarray(np.asarray(x, np.float64)),
                          default_mutable(model, np.float64))
        mm, _ = env.sample_task(jax.random.PRNGKey(0), mm, None)
        row = np.asarray(mm.hfield_row, np.float64)
        size = np.asarray(mm.hfield_size, np.float64)

        mj = _mj_model('half_cheetah_hfield')
        nrow, ncol = int(mj.hfield_nrow[0]), int(mj.hfield_ncol[0])
        assert ncol == row.shape[0]
        # the reference env mutates hfield_size/hfield_data per task the
        # same way (half_cheetah_hfield_env.py:76-166)
        mj.hfield_size[0] = size
        mj.hfield_data[:] = np.tile(row, nrow)
        d = mujoco.MjData(mj)

        rng = np.random.RandomState(0)
        qpos = np.array(model.qpos0, np.float64) + rng.uniform(
            -0.01, 0.01, model.nq)
        qvel = rng.uniform(-0.1, 0.1, model.nv)
        ctrls = rng.uniform(-0.3, 0.3, (50, model.nu))
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        mq = []
        for t in range(50):
            d.ctrl[:] = ctrls[t]
            mujoco.mj_step(mj, d)
            mq.append(d.qpos.copy())
        stepf = jax.jit(lambda s, c: engine.step(model, mm, s, c))
        s = PhysicsState(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel))
        eq = []
        for t in range(50):
            s = stepf(s, jnp.asarray(ctrls[t]))
            eq.append(np.asarray(s.qpos))
        err = np.abs(np.stack(eq) - np.stack(mq)).max()
        assert err < 5e-2, f'{task} prod={production}: {err:.3e}'


class TestHField:
    """Capsule-on-heightfield vs MuJoCo on an identical terrain profile.

    A dedicated mini-model is used so both sides share the exact grid: the
    x-profile (constant along y, as the hfield env's terrains are,
    reference half_cheetah_hfield_env.py:76-166) is written into
    mj.hfield_data and MutableModel.hfield_row.
    """

    def test_capsule_settles_on_slope(self):
        # smooth profile: at sharp kinks MuJoCo's prism triangulation and
        # our 1-D linear surface give different local normals (flat/ramp
        # agree to 1e-4; random-kink terrain to ~1e-2)
        ncol, sx, sz = 41, 4.0, 0.5
        profile = 0.5 + 0.4 * np.sin(np.linspace(0, 2 * np.pi, ncol))

        xml = f"""
<mujoco>
  <option timestep='0.01'/>
  <asset>
    <hfield name='terrain' nrow='2' ncol='{ncol}'
            size='{sx} {sx} {sz} 0.1'/>
  </asset>
  <worldbody>
    <geom type='hfield' hfield='terrain' pos='0 0 0'/>
    <body pos='0 0 1.2'>
      <freejoint/>
      <geom type='capsule' fromto='-0.25 0 0 0.25 0 0' size='0.08'
            mass='1'/>
    </body>
  </worldbody>
</mujoco>"""
        mj = mujoco.MjModel.from_xml_string(xml)
        mj.hfield_data[:] = np.tile(profile, 2)
        d = mujoco.MjData(mj)

        spec = ModelSpec(
            name='hfield_mini',
            option=OptionSpec(timestep=0.01, iterations=100, solver='pgs'),
            world_geoms=[GeomSpec(type=HFIELD, name='terrain',
                                  hfield='terrain')],
            bodies=[BodySpec(
                name='cap', pos=(0., 0., 1.2),
                joints=[JointSpec(type=FREE, name='root')],
                geoms=[GeomSpec(type=CAPSULE,
                                fromto=(-0.25, 0., 0., 0.25, 0., 0.),
                                size=(0.08,), mass=1.0)])],
            hfields=[HFieldSpec(name='terrain', nrow=2, ncol=ncol,
                                size=(sx, sx, sz, 0.1))])
        model = compile_spec(spec)
        mm = default_mutable(model, np.float64)
        mm = dataclasses.replace(mm, hfield_row=profile.astype(np.float64))
        mm = jax.tree.map(jnp.asarray, mm)

        mujoco.mj_forward(mj, d)
        stepf = jax.jit(lambda s: engine.step(model, mm, s,
                                              jnp.zeros((0,), jnp.float64)))
        s = PhysicsState(qpos=jnp.asarray(mj.qpos0, jnp.float64),
                         qvel=jnp.zeros(6, jnp.float64))
        for _ in range(120):
            mujoco.mj_step(mj, d)
            s = stepf(s)
        # settles on the same terrain at the same place/height; grids are
        # identical but triangulation details differ -> statistical bound
        np.testing.assert_allclose(np.asarray(s.qpos[:3]), d.qpos[:3],
                                   atol=5e-3)

class TestTerrainStatistics:
    """Chaos-proof validation of the cliff-edge terrains — basin, steep,
    and random 'hfield' (the hfield env's DEFAULT training distribution,
    half_cheetah_hfield_env.py:76-102) — which diverge per-trajectory at
    the first rim-contact event and so are excluded from
    TestRealTerrain's step-for-step comparison.

    Protocol (VERDICT round-3 next-step #6): the identical terrain, initial
    states, and ctrl streams run in both engines; agreement is asserted on
    seed-ensemble STATISTICS (final forward displacement, contact-event
    activity) rather than trajectories, plus a MuJoCo-anchored bound on the
    worst single-step total-energy injection at kink impacts (soft-contact
    stabilization injects bounded energy in both engines; ours must not
    inject materially more than MuJoCo's on the same terrain)."""

    N_SEEDS = 12
    T = 80

    def _run_pair(self, task, key=0):
        from learning_to_adapt_tpu.envs.half_cheetah import (
            HalfCheetahHFieldEnv)
        from learning_to_adapt_tpu.physics import maths

        env = HalfCheetahHFieldEnv(task=task)
        model = env.model
        mm = jax.tree.map(lambda x: jnp.asarray(np.asarray(x, np.float64)),
                          default_mutable(model, np.float64))
        mm, _ = env.sample_task(jax.random.PRNGKey(key), mm, None)
        row = np.asarray(mm.hfield_row, np.float64)
        size = np.asarray(mm.hfield_size, np.float64)

        mj = _mj_model('half_cheetah_hfield')
        nrow = int(mj.hfield_nrow[0])
        mj.hfield_size[0] = size
        mj.hfield_data[:] = np.tile(row, nrow)

        @jax.jit
        def step_stats(state, ctrl):
            nstate = engine.step(model, mm, state, ctrl)
            xpos, xquat, _ = engine._fk(model, mm, nstate.qpos)
            ximat = maths.quat_to_mat(xquat)
            gpos, gmat = engine._geom_frames(model, mm, xpos, ximat)
            dist, _, _, _, cmeta = engine._contacts(model, mm, gpos, gmat)
            margin = jnp.asarray(cmeta['margin'], dist.dtype)
            ncon = jnp.sum(dist < margin)
            pot, kin = engine.energy(model, mm, nstate)
            return nstate, ncon, pot + kin

        ours = dict(disp=[], confrac=[], ejump=[])
        theirs = dict(disp=[], confrac=[], ejump=[])
        for seed in range(self.N_SEEDS):
            rng = np.random.RandomState(1000 + seed)
            qpos = np.array(model.qpos0, np.float64) + rng.uniform(
                -0.01, 0.01, model.nq)
            qvel = rng.uniform(-0.1, 0.1, model.nv)
            ctrls = rng.uniform(-0.3, 0.3, (self.T, model.nu))

            # ours
            s = PhysicsState(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel))
            pot0, kin0 = engine.energy(model, mm, s)
            e_prev = float(pot0 + kin0)
            ncons, ejumps = [], []
            for t in range(self.T):
                s, ncon, e = step_stats(s, jnp.asarray(ctrls[t]))
                ncons.append(int(ncon))
                ejumps.append(float(e) - e_prev)
                e_prev = float(e)
            ours['disp'].append(float(s.qpos[0]) - qpos[0])
            ours['confrac'].append(np.mean(np.asarray(ncons) > 0))
            ours['ejump'].append(max(ejumps))

            # mujoco
            d = mujoco.MjData(mj)
            d.qpos[:] = qpos
            d.qvel[:] = qvel
            mujoco.mj_energyPos(mj, d)
            mujoco.mj_energyVel(mj, d)
            e_prev = float(d.energy[0] + d.energy[1])
            ncons, ejumps = [], []
            for t in range(self.T):
                d.ctrl[:] = ctrls[t]
                mujoco.mj_step(mj, d)
                mujoco.mj_energyPos(mj, d)
                mujoco.mj_energyVel(mj, d)
                e = float(d.energy[0] + d.energy[1])
                ncons.append(int(d.ncon))
                ejumps.append(e - e_prev)
                e_prev = e
            theirs['disp'].append(float(d.qpos[0]) - qpos[0])
            theirs['confrac'].append(np.mean(np.asarray(ncons) > 0))
            theirs['ejump'].append(max(ejumps))
        return {k: np.asarray(v) for k, v in ours.items()}, \
               {k: np.asarray(v) for k, v in theirs.items()}

    @pytest.mark.parametrize('task', ['basin', 'steep', 'hfield'])
    def test_terrain_ensemble_statistics(self, task):
        ours, mj = self._run_pair(task)
        n = self.N_SEEDS

        # forward-displacement distribution: means within the calibrated
        # residual bound. The round-4 polyline+depth-cap collider fix took
        # the basin gap from 0.29 (rim-launch regime) to <=0.10; what
        # remains is buried-spawn friction creep (MuJoCo drifts ~+0.087
        # terrain-independently while its feet stay saturated-depth buried;
        # ours partially ejects and creeps with the local slope — measured
        # 0.08-0.14, docs/PARITY.md round-4 notes). 0.2 is the regression
        # bound: the pre-fix launch regime sat at 0.29+.
        sem = np.sqrt(ours['disp'].var() / n + mj['disp'].var() / n)
        gap = abs(ours['disp'].mean() - mj['disp'].mean())
        assert gap < max(3.0 * sem + 0.05, 0.2), (
            f'{task}: displacement means {ours["disp"].mean():.3f} vs '
            f'{mj["disp"].mean():.3f} (gap {gap:.3f})')

        # contact-event activity: fraction of steps with >=1 active contact
        cgap = abs(ours['confrac'].mean() - mj['confrac'].mean())
        assert cgap < 0.10, (
            f'{task}: contact-active step fraction {ours["confrac"].mean():.3f} '
            f'vs {mj["confrac"].mean():.3f}')

        # energy injection at impacts: our worst single-step total-energy
        # jump must not materially exceed MuJoCo's on the same terrain
        ours_max = ours['ejump'].max()
        mj_max = mj['ejump'].max()
        assert ours_max < max(1.5 * mj_max, mj_max + 2.0), (
            f'{task}: max step energy jump {ours_max:.2f} vs MuJoCo '
            f'{mj_max:.2f}')
