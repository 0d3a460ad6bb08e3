"""Quaternion / rotation / spatial-vector math for the TPU physics core.

Conventions (MuJoCo-compatible where it matters for parity):
  - quaternions are (w, x, y, z), unit norm
  - spatial motion vectors are 6-D world-frame Pluecker coordinates about the
    world origin: m = (angular, linear_at_origin)
  - spatial force vectors are (torque_about_origin, force)

All functions are pure jnp and safe under jit/vmap/grad. Host-side model
compilation uses the same functions with numpy inputs via jnp's duck typing.

Reference parity notes: replaces the quaternion helpers hand-rolled in the
reference (envs/mujoco_env.py:18-26) and the C-side mju_* routines of
libmujoco131 (SURVEY.md section 2.1).
"""
import jax.numpy as jnp


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_mul(a, b):
    """Hamilton product a*b, (w,x,y,z) convention."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def quat_conj(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q, v):
    """Rotate vector v by quaternion q (active rotation, body->world)."""
    qw = q[..., 0:1]
    qv = q[..., 1:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_rotate_inv(q, v):
    return quat_rotate(quat_conj(q), v)


def quat_to_mat(q):
    """3x3 rotation matrix from quaternion."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], axis=-1)
    return r.reshape(q.shape[:-1] + (3, 3))


def axis_angle_to_quat(axis, angle):
    """Unit quaternion for rotation of `angle` radians about (unit) `axis`."""
    s = jnp.sin(angle * 0.5)
    return jnp.concatenate(
        [jnp.cos(angle * 0.5)[..., None], axis * s[..., None]], axis=-1)


def quat_integrate(q, omega_local, dt):
    """Integrate orientation with body-frame angular velocity (MuJoCo free
    joint convention: rotational qvel is expressed in the child body frame)."""
    angle = jnp.linalg.norm(omega_local, axis=-1)
    # safe normalize: when angle ~ 0 the sin(angle/2)*axis term -> 0 anyway
    axis = omega_local / jnp.where(angle > 1e-12, angle, 1.0)[..., None]
    dq = axis_angle_to_quat(axis, angle * dt)
    return quat_normalize(quat_mul(q, dq))


def cross3(a, b):
    return jnp.cross(a, b)


def motion_cross(a, b):
    """Spatial cross product for motion vectors: a x b, both (…,6)."""
    aw, av = a[..., :3], a[..., 3:]
    bw, bv = b[..., :3], b[..., 3:]
    return jnp.concatenate(
        [jnp.cross(aw, bw), jnp.cross(aw, bv) + jnp.cross(av, bw)], axis=-1)


def motion_cross_force(a, f):
    """Spatial cross product, motion x* force: a (…,6) motion, f (…,6) force."""
    aw, av = a[..., :3], a[..., 3:]
    ft, ff = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(aw, ft) + jnp.cross(av, ff), jnp.cross(aw, ff)], axis=-1)


def spatial_inertia(mass, com, inertia_com):
    """6x6 world-origin spatial inertia of a rigid body.

    Args:
      mass: () scalar
      com: (3,) world position of the center of mass
      inertia_com: (3,3) rotational inertia about the COM in world axes

    Layout matches motion (ang, lin_at_origin) / force (torque_at_origin, f):
      I = [[I_c - m*cx*cx, m*cx], [-m*cx, m*1]]
    with cx the skew matrix of com.
    """
    cx = skew(com)
    m_eye = mass[..., None, None] * jnp.eye(3, dtype=com.dtype)
    top_left = inertia_com - mass[..., None, None] * (cx @ cx)
    top_right = mass[..., None, None] * cx
    bottom_left = -top_right
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bottom = jnp.concatenate([bottom_left, m_eye], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def skew(v):
    """Skew-symmetric cross-product matrix of (…,3)."""
    zero = jnp.zeros_like(v[..., 0])
    return jnp.stack([
        zero, -v[..., 2], v[..., 1],
        v[..., 2], zero, -v[..., 0],
        -v[..., 1], v[..., 0], zero,
    ], axis=-1).reshape(v.shape[:-1] + (3, 3))


def point_velocity(motion, point):
    """Linear velocity at world `point` of a body moving with spatial `motion`
    (…,6) expressed about the world origin."""
    w, v0 = motion[..., :3], motion[..., 3:]
    return v0 + jnp.cross(w, point)
