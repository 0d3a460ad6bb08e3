"""Analytic unit tests for the physics core: free fall, pendulum dynamics &
energy, slide joints, actuation, damping, springs, joint limits, contacts.

The reference ships no tests (SURVEY.md section 4); these are the per-op
validation layer for the TPU physics engine."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from learning_to_adapt_tpu.physics import (
    CAPSULE, EULER, FREE, HINGE, PLANE, RK4, SLIDE, SPHERE,
    ActuatorSpec, BodySpec, GeomSpec, JointSpec, ModelSpec, OptionSpec,
    PhysicsState, compile_spec, default_mutable, forward, step)

F64 = np.float64


@pytest.fixture(autouse=True)
def _x64_mode():
    """Run physics-accuracy tests in float64, but restore the global flag so
    the rest of the suite (f32 end-to-end paths) is unaffected — a
    module-level update leaks into every other test file at collection."""
    old = jax.config.jax_enable_x64
    jax.config.update('jax_enable_x64', True)
    yield
    jax.config.update('jax_enable_x64', old)


def make_state(model, qpos=None, qvel=None):
    qp = np.asarray(qpos if qpos is not None else model.qpos0, F64)
    qv = np.asarray(qvel if qvel is not None else np.zeros(model.nv), F64)
    return PhysicsState(qpos=jnp.asarray(qp), qvel=jnp.asarray(qv))


def rollout(model, mm, state, ctrl, n):
    ctrl = jnp.asarray(ctrl, F64)

    @jax.jit
    def run(s):
        return jax.lax.scan(lambda c, _: (step(model, mm, c, ctrl), None),
                            s, None, length=n)[0]

    return run(state)


def pendulum_spec(damping=0.0, integrator=EULER, timestep=1e-3):
    """Point-mass-ish pendulum: small sphere at the end of a massless-ish rod
    modeled as a sphere offset 1m below a hinge about y."""
    body = BodySpec(
        name='bob', pos=(0, 0, 0),
        joints=[JointSpec(type=HINGE, name='hinge', axis=(0, 1, 0),
                          damping=damping)],
        geoms=[GeomSpec(type=SPHERE, size=(0.05,), pos=(0, 0, -1.0),
                        density=1000.0, contype=0, conaffinity=0)])
    return ModelSpec(
        name='pendulum',
        option=OptionSpec(timestep=timestep, gravity=(0, 0, -9.81),
                          integrator=integrator),
        bodies=[body])


class TestFreeFall:
    def test_free_body_falls(self):
        body = BodySpec(
            name='ball', pos=(0, 0, 1.0),
            joints=[JointSpec(type=FREE)],
            geoms=[GeomSpec(type=SPHERE, size=(0.1,), contype=0,
                            conaffinity=0)])
        spec = ModelSpec(option=OptionSpec(timestep=1e-3), bodies=[body])
        model = compile_spec(spec)
        mm = default_mutable(model, F64)
        s = make_state(model)
        n = 500
        s = rollout(model, mm, s, np.zeros(0), n)
        t = n * 1e-3
        # semi-implicit Euler: z = z0 - g*h*sum(k) = z0 - g*h^2*n(n+1)/2
        z_expect = 1.0 - 9.81 * 1e-3 ** 2 * n * (n + 1) / 2
        assert abs(float(s.qpos[2]) - z_expect) < 1e-6
        assert abs(float(s.qvel[2]) + 9.81 * t) < 1e-6
        # no rotation, no horizontal drift
        np.testing.assert_allclose(np.asarray(s.qpos[3:7]), [1, 0, 0, 0],
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(s.qpos[0:2]), 0, atol=1e-12)

    def test_projectile_rk4(self):
        body = BodySpec(
            name='ball', pos=(0, 0, 0),
            joints=[JointSpec(type=FREE)],
            geoms=[GeomSpec(type=SPHERE, size=(0.1,), contype=0,
                            conaffinity=0)])
        spec = ModelSpec(option=OptionSpec(timestep=0.01, integrator=RK4),
                         bodies=[body])
        model = compile_spec(spec)
        mm = default_mutable(model, F64)
        qvel = np.zeros(6)
        qvel[0] = 2.0  # vx
        qvel[2] = 5.0  # vz
        s = make_state(model, qvel=qvel)
        s = rollout(model, mm, s, np.zeros(0), 100)
        t = 1.0
        assert abs(float(s.qpos[0]) - 2.0 * t) < 1e-8
        assert abs(float(s.qpos[2]) - (5.0 * t - 0.5 * 9.81 * t * t)) < 1e-3


class TestPendulum:
    def test_equilibrium(self):
        model = compile_spec(pendulum_spec())
        mm = default_mutable(model, F64)
        s = make_state(model)  # hanging straight down
        s2 = rollout(model, mm, s, np.zeros(0), 100)
        assert abs(float(s2.qpos[0])) < 1e-10

    def test_small_oscillation_frequency(self):
        # physical pendulum: sphere m at L=1, I_pivot = m L^2 + 2/5 m r^2
        # omega^2 = m g L / I_pivot
        model = compile_spec(pendulum_spec(timestep=1e-4, integrator=RK4))
        mm = default_mutable(model, F64)
        r, L = 0.05, 1.0
        i_pivot = L * L + 0.4 * r * r
        omega = np.sqrt(9.81 * L / i_pivot)
        theta0 = 0.02
        s = make_state(model, qpos=[theta0])
        # integrate quarter period, angle should cross ~0
        quarter = (2 * np.pi / omega) / 4
        n = int(quarter / 1e-4)
        s = rollout(model, mm, s, np.zeros(0), n)
        assert abs(float(s.qpos[0])) < theta0 * 0.05

    def test_energy_conservation_rk4(self):
        model = compile_spec(pendulum_spec(timestep=1e-3, integrator=RK4))
        mm = default_mutable(model, F64)
        theta0 = 1.2
        s = make_state(model, qpos=[theta0])

        def energy(s):
            d = forward(model, mm, s)
            com = d.subtree_com[model.body_id('bob')]
            r, L = 0.05, 1.0
            m = float(mm.body_mass[1])
            i_pivot = m * (L * L + 0.4 * r * r)
            return (0.5 * i_pivot * float(s.qvel[0]) ** 2 +
                    m * 9.81 * float(com[2]))

        e0 = energy(s)
        s = rollout(model, mm, s, np.zeros(0), 2000)
        e1 = energy(s)
        assert abs(e1 - e0) / abs(e0) < 1e-5

    def test_damping_dissipates(self):
        model = compile_spec(pendulum_spec(damping=0.5, timestep=1e-3))
        mm = default_mutable(model, F64)
        s = make_state(model, qpos=[1.0])
        s = rollout(model, mm, s, np.zeros(0), 20000)
        assert abs(float(s.qpos[0])) < 1e-3
        assert abs(float(s.qvel[0])) < 1e-3

    def test_actuator_gear_torque(self):
        spec = pendulum_spec(timestep=1e-3)
        spec.actuators = [ActuatorSpec(joint='hinge', gear=10.0,
                                       ctrlrange=(-1, 1))]
        model = compile_spec(spec)
        mm = default_mutable(model, F64)
        # torque = gear*ctrl must hold the pendulum at angle where
        # m g L sin(theta) = gear*ctrl
        m = float(mm.body_mass[1])
        ctrl = 0.5
        theta_eq = np.arcsin(10.0 * ctrl / (m * 9.81 * 1.0))
        s = make_state(model, qpos=[theta_eq])
        s2 = rollout(model, mm, s, np.array([ctrl]), 200)
        assert abs(float(s2.qpos[0]) - theta_eq) < 1e-4

    def test_ctrl_clamped_to_range(self):
        spec = pendulum_spec(timestep=1e-3)
        spec.actuators = [ActuatorSpec(joint='hinge', gear=10.0,
                                       ctrlrange=(-1, 1))]
        model = compile_spec(spec)
        mm = default_mutable(model, F64)
        s = make_state(model)
        s_big = rollout(model, mm, s, np.array([100.0]), 50)
        s_one = rollout(model, mm, s, np.array([1.0]), 50)
        np.testing.assert_allclose(np.asarray(s_big.qpos),
                                   np.asarray(s_one.qpos), atol=1e-12)


class TestSlideAndSpring:
    def test_spring_oscillator(self):
        # vertical slide joint with stiffness: equilibrium at -mg/k offset
        body = BodySpec(
            name='mass', pos=(0, 0, 0),
            joints=[JointSpec(type=SLIDE, axis=(0, 0, 1), stiffness=500.0,
                              damping=5.0)],
            geoms=[GeomSpec(type=SPHERE, size=(0.1,), density=1000.0,
                            contype=0, conaffinity=0)])
        spec = ModelSpec(option=OptionSpec(timestep=1e-3), bodies=[body])
        model = compile_spec(spec)
        mm = default_mutable(model, F64)
        m = float(mm.body_mass[1])
        s = make_state(model)
        s = rollout(model, mm, s, np.zeros(0), 20000)
        assert abs(float(s.qpos[0]) + m * 9.81 / 500.0) < 1e-4


class TestJointLimit:
    def test_limit_stops_joint(self):
        spec = pendulum_spec(timestep=1e-3)
        spec.bodies[0].joints[0].limited = True
        spec.bodies[0].joints[0].range = (-0.3, 0.3)
        model = compile_spec(spec)
        mm = default_mutable(model, F64)
        s = make_state(model, qvel=[5.0])
        s = rollout(model, mm, s, np.zeros(0), 3000)
        assert float(s.qpos[0]) < 0.35  # small soft-constraint overshoot ok


class TestContacts:
    def _ball_on_plane(self, integrator=EULER):
        body = BodySpec(
            name='ball', pos=(0, 0, 1.0),
            joints=[JointSpec(type=FREE)],
            geoms=[GeomSpec(type=SPHERE, size=(0.1,), friction=(1., .005, 1e-4),
                            solref=(0.02, 1.0), solimp=(0.9, 0.95, 0.001))])
        floor = GeomSpec(type=PLANE, name='floor', size=(40, 40, 40),
                         contype=1, conaffinity=1)
        spec = ModelSpec(option=OptionSpec(timestep=2e-3,
                                           integrator=integrator),
                         world_geoms=[floor], bodies=[body])
        return compile_spec(spec)

    def test_ball_rests_on_plane(self):
        model = self._ball_on_plane()
        mm = default_mutable(model, F64)
        s = make_state(model)
        s = rollout(model, mm, s, np.zeros(0), 2000)
        z = float(s.qpos[2])
        assert 0.08 < z < 0.12  # resting near radius height
        assert abs(float(s.qvel[2])) < 1e-3

    def test_ball_friction_stops_sliding(self):
        model = self._ball_on_plane()
        mm = default_mutable(model, F64)
        qpos = np.asarray(model.qpos0).copy()
        qpos[2] = 0.1
        qvel = np.zeros(6)
        qvel[0] = 2.0
        s = make_state(model, qpos=qpos, qvel=qvel)
        s = rollout(model, mm, s, np.zeros(0), 3000)
        # with friction the ball transitions to rolling: vx = omega_y * r
        vx = float(s.qvel[0])
        wy = float(s.qvel[4])
        assert abs(vx - wy * 0.1) < 1e-2
        assert vx < 2.0  # slowed down from pure slide


class TestCompile:
    def test_capsule_inertia_formula(self):
        g = GeomSpec(type=CAPSULE, size=(0.1, 0.5), density=1000.0)
        body = BodySpec(name='c', joints=[JointSpec(type=FREE)], geoms=[g])
        model = compile_spec(ModelSpec(bodies=[body]))
        r, hl, rho = 0.1, 0.5, 1000.0
        m_cyl = rho * np.pi * r * r * 2 * hl
        m_sph = rho * 4 / 3 * np.pi * r ** 3
        assert abs(model.body_mass0[1] - (m_cyl + m_sph)) < 1e-9
        # symmetric capsule: Ixx == Iyy > 0, Izz smaller for long capsule
        i = model.body_inertia[1]
        assert abs(i[0, 0] - i[1, 1]) < 1e-12
        assert i[0, 0] > i[2, 2] > 0

    def test_settotalmass(self):
        g = GeomSpec(type=SPHERE, size=(0.1,), density=1000.0)
        body = BodySpec(name='b', joints=[JointSpec(type=FREE)], geoms=[g])
        model = compile_spec(ModelSpec(bodies=[body], settotalmass=14.0))
        assert abs(model.body_mass0.sum() - 14.0) < 1e-9


class TestBatching:
    def test_vmap_over_envs(self):
        model = compile_spec(pendulum_spec())
        mm = default_mutable(model, F64)
        thetas = jnp.asarray(np.linspace(-1, 1, 16))
        states = PhysicsState(qpos=thetas[:, None],
                              qvel=jnp.zeros((16, 1), F64))
        stepv = jax.jit(jax.vmap(lambda s: step(model, mm, s,
                                                jnp.zeros(0, F64))))
        out = stepv(states)
        assert out.qpos.shape == (16, 1)
        # batched result matches single-env results
        s0 = step(model, mm, PhysicsState(qpos=thetas[3:4],
                                          qvel=jnp.zeros(1, F64)),
                  jnp.zeros(0, F64))
        np.testing.assert_allclose(np.asarray(out.qpos[3]),
                                   np.asarray(s0.qpos), rtol=1e-12)
