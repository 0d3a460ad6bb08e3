"""Narrow-phase collision kernels.

Replaces MuJoCo's mj_collision for the geom-pair kinds the five reference
environments exercise (SURVEY.md section 2.1 row 1): capsule/sphere vs plane,
capsule vs heightfield (half_cheetah_hfield), capsule vs box (blocks env),
plus sphere/capsule pairs for the arm's self-contacts.

Every kernel is a pure jnp function evaluated for a *static* candidate pair
list (PhysicsModel.pair_groups), producing a fixed number of candidate
contacts per pair: jit sees constant shapes, inactive candidates are masked by
``dist > margin`` downstream. The heightfield is represented by its
x-profile row (MutableModel.hfield_row) because every reference task
generates terrain constant along y (reference half_cheetah_hfield_env.py:
76-166 tiles a 500-long row across 528 columns).

Each contact: (dist, pos(3,), normal(3,)) with the normal pointing from
geom1 toward geom2, so d(dist)/dt = n . (v_p(body2) - v_p(body1)).
"""
import jax.numpy as jnp


def _sphere_sphere_raw(c1, r1, c2, r2):
    d = c2 - c1
    dist_c = jnp.linalg.norm(d)
    # guard zero distance (coincident centers)
    n = d / jnp.where(dist_c > 1e-9, dist_c, 1.0)
    n = jnp.where(dist_c > 1e-9, n, jnp.array([0., 0., 1.], dtype=c1.dtype))
    dist = dist_c - r1 - r2
    pos = c1 + n * (r1 + 0.5 * dist)
    return dist, pos, n


def plane_sphere(plane_pos, plane_mat, c, r):
    """Plane is geom1. Returns 1 contact."""
    n = plane_mat[:, 2]
    dist = jnp.dot(n, c - plane_pos) - r
    pos = c - n * (r + 0.5 * dist)
    return dist[None], pos[None], n[None]


def plane_capsule(plane_pos, plane_mat, cap_pos, cap_mat, r, hl):
    """Plane is geom1. Returns 2 contacts (one per capsule endpoint)."""
    axis = cap_mat[:, 2]
    e1 = cap_pos + axis * hl
    e2 = cap_pos - axis * hl
    d1, p1, n1 = plane_sphere(plane_pos, plane_mat, e1, r)
    d2, p2, n2 = plane_sphere(plane_pos, plane_mat, e2, r)
    return (jnp.concatenate([d1, d2]), jnp.concatenate([p1, p2]),
            jnp.concatenate([n1, n2]))


def _hfield_surface(hf_pos, hf_size, hf_row, x, y):
    """Surface height and outward normal of the x-profile heightfield at
    world (x, y). hf_row is the normalized [0,1] profile along x with ncol
    samples spanning [-size_x, size_x]."""
    ncol = hf_row.shape[0]
    sx, sz = hf_size[0], hf_size[2]
    # world x -> fractional sample index
    u = (x - hf_pos[0] + sx) / (2 * sx) * (ncol - 1)
    u = jnp.clip(u, 0.0, ncol - 1.000001)
    i0 = jnp.floor(u).astype(jnp.int32)
    frac = u - i0
    h0 = hf_row[i0]
    h1 = hf_row[jnp.minimum(i0 + 1, ncol - 1)]
    z = hf_pos[2] + (h0 + (h1 - h0) * frac) * sz
    # slope dz/dx from the local cell
    dx_cell = 2 * sx / (ncol - 1)
    slope = (h1 - h0) * sz / dx_cell
    n = jnp.stack([-slope, jnp.zeros_like(slope), jnp.ones_like(slope)])
    n = n / jnp.linalg.norm(n)
    return z, n


def hfield_sphere(hf_pos, hf_size, hf_row, c, r):
    """Heightfield is geom1. Returns 1 contact (local surface-plane approx)."""
    z, n = _hfield_surface(hf_pos, hf_size, hf_row, c[0], c[1])
    s = jnp.stack([c[0], c[1], z])
    dist = jnp.dot(n, c - s) - r
    pos = c - n * (r + 0.5 * dist)
    return dist[None], pos[None], n[None]


def hfield_capsule(hf_pos, hf_size, hf_row, cap_pos, cap_mat, r, hl):
    axis = cap_mat[:, 2]
    e1 = cap_pos + axis * hl
    e2 = cap_pos - axis * hl
    d1, p1, n1 = hfield_sphere(hf_pos, hf_size, hf_row, e1, r)
    d2, p2, n2 = hfield_sphere(hf_pos, hf_size, hf_row, e2, r)
    return (jnp.concatenate([d1, d2]), jnp.concatenate([p1, p2]),
            jnp.concatenate([n1, n2]))


def _closest_on_segment(p, a, b):
    ab = b - a
    t = jnp.dot(p - a, ab) / jnp.maximum(jnp.dot(ab, ab), 1e-12)
    return a + jnp.clip(t, 0.0, 1.0) * ab


def sphere_capsule(c, r, cap_pos, cap_mat, rc, hl):
    """Sphere is geom1, capsule geom2. 1 contact."""
    axis = cap_mat[:, 2]
    q = _closest_on_segment(c, cap_pos - axis * hl, cap_pos + axis * hl)
    d, p, n = _sphere_sphere_raw(c, r, q, rc)
    return d[None], p[None], n[None]


def capsule_capsule(p1, m1, r1, h1, p2, m2, r2, h2):
    """Closest segment-segment points, then sphere-sphere. 1 contact."""
    a1, a2 = m1[:, 2], m2[:, 2]
    s1a, s1b = p1 - a1 * h1, p1 + a1 * h1
    s2a, s2b = p2 - a2 * h2, p2 + a2 * h2
    # segment-segment closest points (clamped, standard algorithm)
    d1 = s1b - s1a
    d2 = s2b - s2a
    r = s1a - s2a
    a = jnp.dot(d1, d1)
    e = jnp.dot(d2, d2)
    f = jnp.dot(d2, r)
    c = jnp.dot(d1, r)
    b = jnp.dot(d1, d2)
    denom = jnp.maximum(a * e - b * b, 1e-12)
    s = jnp.clip((b * f - c * e) / denom, 0.0, 1.0)
    t = jnp.clip((b * s + f) / jnp.maximum(e, 1e-12), 0.0, 1.0)
    s = jnp.clip((b * t - c) / jnp.maximum(a, 1e-12), 0.0, 1.0)
    q1 = s1a + s * d1
    q2 = s2a + t * d2
    d, p, n = _sphere_sphere_raw(q1, r1, q2, r2)
    return d[None], p[None], n[None]


def sphere_sphere(c1, r1, c2, r2):
    d, p, n = _sphere_sphere_raw(c1, r1, c2, r2)
    return d[None], p[None], n[None]


def _sphere_box_raw(c, r, box_pos, box_mat, half):
    """Sphere center c vs box. Returns (dist, pos, n) with n from sphere
    toward the box, handling the center-inside-box case."""
    cl = box_mat.T @ (c - box_pos)            # center in box frame
    q = jnp.clip(cl, -half, half)             # closest point, box frame
    delta = cl - q
    d_out = jnp.linalg.norm(delta)
    outside = d_out > 1e-9
    # outside branch
    n_out = -(box_mat @ (delta / jnp.where(outside, d_out, 1.0)))
    dist_out = d_out - r
    # inside branch: push out along nearest face
    face_depth = half - jnp.abs(cl)
    k = jnp.argmin(face_depth)
    sign = jnp.sign(cl[k]) + (cl[k] == 0.0)
    n_face_local = jnp.zeros(3, dtype=c.dtype).at[k].set(sign)
    n_in = -(box_mat @ n_face_local)
    dist_in = -(face_depth[k] + r)
    dist = jnp.where(outside, dist_out, dist_in)
    n = jnp.where(outside, n_out, n_in)
    pos = c + n * (r + 0.5 * dist)
    return dist, pos, n


def sphere_box(c, r, box_pos, box_mat, half):
    d, p, n = _sphere_box_raw(c, r, box_pos, box_mat, half)
    return d[None], p[None], n[None]


def capsule_box(cap_pos, cap_mat, r, hl, box_pos, box_mat, half):
    """Capsule geom1 vs box geom2: 2 contacts from the endpoint spheres."""
    axis = cap_mat[:, 2]
    e1 = cap_pos + axis * hl
    e2 = cap_pos - axis * hl
    d1, p1, n1 = _sphere_box_raw(e1, r, box_pos, box_mat, half)
    d2, p2, n2 = _sphere_box_raw(e2, r, box_pos, box_mat, half)
    return (jnp.stack([d1, d2]), jnp.stack([p1, p2]), jnp.stack([n1, n2]))
