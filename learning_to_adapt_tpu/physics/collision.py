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
import jax
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


HF_WINDOW = 16  # polyline cells searched each side of the sphere center


def hfield_sphere(hf_pos, hf_size, hf_row, c, r):
    """Heightfield is geom1. Returns 1 contact.

    Nearest-feature distance to the terrain's x-z POLYLINE (the profile is
    constant along y for every task this env family generates, so the 2-D
    cross-section is the exact surface — the y-constant analog of MuJoCo's
    triangular-prism decomposition). A local surface-plane sample here
    (the pre-round-4 approximation) measured penetration VERTICALLY, which
    at step edges reported ~5x-too-deep contacts with vertical normals and
    launched bodies off cliff rims (found by
    tests/test_mujoco_crosscheck.py::TestTerrainStatistics — basin
    displacement 0.375 vs MuJoCo 0.084); the polyline distance reproduces
    MuJoCo's shallow angled rim contacts. Search window: +-HF_WINDOW cells
    (+-3.2 m at the 0.2 m reference grid) around the center column —
    far wider than any per-step penetration."""
    ncol = hf_row.shape[0]
    sx, sz = hf_size[0], hf_size[2]
    dx_cell = 2 * sx / (ncol - 1)
    u = (c[0] - hf_pos[0] + sx) / (2 * sx) * (ncol - 1)
    i_c = jnp.floor(u).astype(jnp.int32)
    w = 2 * HF_WINDOW + 1
    start = jnp.clip(i_c - HF_WINDOW, 0, ncol - w)
    zs = jax.lax.dynamic_slice_in_dim(hf_row, start, w) * sz + hf_pos[2]
    xs = ((jnp.arange(w) + start) * dx_cell - sx + hf_pos[0]).astype(
        zs.dtype)
    p = jnp.stack([c[0], c[2]])
    a = jnp.stack([xs[:-1], zs[:-1]], axis=1)            # (w-1, 2)
    ab = jnp.stack([xs[1:], zs[1:]], axis=1) - a
    t = jnp.clip(jnp.sum((p - a) * ab, axis=1)
                 / jnp.maximum(jnp.sum(ab * ab, axis=1), 1e-12), 0.0, 1.0)
    q = a + t[:, None] * ab                              # nearest per segment
    d2 = jnp.sum(jnp.square(p - q), axis=1)
    k = jnp.argmin(d2)
    diff = p - q[k]
    dist2d = jnp.sqrt(d2[k] + 1e-16)
    z_surf, n_loc = _hfield_surface(hf_pos, hf_size, hf_row, c[0], c[1])
    sign = jnp.where(c[2] < z_surf, -1.0, 1.0).astype(dist2d.dtype)
    n2 = sign * diff / dist2d
    # degenerate (center exactly on the surface): local cell normal
    n2 = jnp.where(dist2d < 1e-9,
                   jnp.stack([n_loc[0], n_loc[2]]), n2)
    n = jnp.stack([n2[0], jnp.zeros_like(n2[0]), n2[1]])
    dist = sign * dist2d - r
    # depth cap at the center-on-surface configuration: MuJoCo's prism
    # collider saturates hfield penetration at ~(r + eps) however deep the
    # geom sinks (measured on the reference XML: r=0.046 -> -0.0498,
    # r=0.1 -> -0.1038, invariant to burial depth and hfield base size).
    # Without the cap, a foot spawned/stepping into a plateau reports
    # multiple-radii depths and the soft-constraint solver launches the
    # body — exactly the basin-rim launch TestTerrainStatistics caught.
    dist = jnp.maximum(dist, -(r + 0.005))
    pos = c - n * (r + 0.5 * dist)
    return dist[None], pos[None], n[None]


def hfield_capsule(hf_pos, hf_size, hf_row, cap_pos, cap_mat, r, hl):
    """Capsule vs heightfield: endpoint-sphere samples against the terrain
    polyline. (A 5-point core manifold was measured in round 4 and changed
    ensemble statistics by <0.02 while tripling the constraint rows —
    MuJoCo's wider prism manifold is not where the residual buried-contact
    creep difference lives; docs/PARITY.md round-4 notes.)"""
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


_BIG = 1e6


def _one_hot3(k, dtype):
    return (jnp.arange(3) == k).astype(dtype)


def _face_manifold(ref_p, ref_m, ref_half, inc_p, inc_m, inc_half):
    """Face-contact manifold with `ref` as the reference box.

    Works in the reference box's local frame. The reference face is the
    ref-box face with maximum separation; candidate contact points are (a)
    the 4 incident-face corners, (b) the 4 reference-face corners, and (c)
    the 16 2D edge-edge intersections between the two face rectangles —
    together these cover every vertex of the convex overlap polygon. The 4
    deepest valid candidates are kept (top_k), mirroring the <=4-point
    manifolds MuJoCo's mjc_BoxBox emits for face-face stacks.

    Returns (sep_best, dist(4,), pos_local(4,3) in ref frame, n_local(3,)).
    """
    dtype = ref_p.dtype
    eps = 1e-9
    Ri = ref_m.T @ inc_m                   # incident axes in ref frame (cols)
    ci = ref_m.T @ (inc_p - ref_p)         # incident center in ref frame
    aRi = jnp.abs(Ri)
    sep = jnp.abs(ci) - (ref_half + aRi @ inc_half)   # (3,) face separations
    k = jnp.argmax(sep)
    sep_best = sep[k]
    s = jnp.where(ci[k] >= 0, 1.0, -1.0).astype(dtype)
    onek = _one_hot3(k, dtype)
    n_l = s * onek                         # ref outward face normal (local)

    # incident face: most anti-parallel to n_l
    mcomp = Ri.T @ n_l                     # n_l components along inc axes
    j = jnp.argmax(jnp.abs(mcomp))
    onej = _one_hot3(j, dtype)
    sj = -jnp.where(mcomp[j] >= 0, 1.0, -1.0).astype(dtype)
    fc = ci + sj * (inc_half @ onej) * (Ri @ onej)    # incident face center
    j1 = jnp.mod(j + 1, 3)
    j2 = jnp.mod(j + 2, 3)
    onej1 = _one_hot3(j1, dtype)
    onej2 = _one_hot3(j2, dtype)
    a_u = (inc_half @ onej1) * (Ri @ onej1)           # incident face edges
    a_v = (inc_half @ onej2) * (Ri @ onej2)

    # face-local coordinates: rows of P map local xyz -> (u, v, w=face axis)
    k1 = jnp.mod(k + 1, 3)
    k2 = jnp.mod(k + 2, 3)
    P = jnp.stack([_one_hot3(k1, dtype), _one_hot3(k2, dtype), onek])
    hu = ref_half @ P[0]
    hv = ref_half @ P[1]
    hw = ref_half @ P[2]

    # incident face corners, cyclic order, in face coords
    signs = jnp.asarray([[1., 1.], [1., -1.], [-1., -1.], [-1., 1.]], dtype)
    corners = fc[None, :] + signs[:, 0:1] * a_u[None, :] + \
        signs[:, 1:2] * a_v[None, :]                   # (4,3) ref-local
    cf = corners @ P.T                                 # (4,3) face coords
    # incident plane in face coords: ni_f . (x - fc_f) = 0
    ni_f = P @ (sj * (Ri @ onej))
    fc_f = P @ fc
    niw = jnp.where(jnp.abs(ni_f[2]) < 1e-6,
                    jnp.where(ni_f[2] >= 0, 1e-6, -1e-6), ni_f[2])

    def plane_w(u, v):
        return (jnp.dot(ni_f, fc_f) - ni_f[0] * u - ni_f[1] * v) / niw

    tol = 1e-7
    # (a) incident corners: valid if inside the reference face rectangle
    ua, va, wa = cf[:, 0], cf[:, 1], cf[:, 2]
    valid_a = (jnp.abs(ua) <= hu + tol) & (jnp.abs(va) <= hv + tol)

    # (b) reference face corners: valid if inside the incident 2D quad
    ub = signs[:, 0] * hu
    vb = signs[:, 1] * hv
    wb = plane_w(ub, vb)
    q2 = cf[:, :2]                                     # (4,2) cyclic quad
    e2 = jnp.roll(q2, -1, axis=0) - q2                 # (4,2) quad edges
    pb = jnp.stack([ub, vb], axis=-1)                  # (4,2)
    rel = pb[:, None, :] - q2[None, :, :]              # (4 pts,4 edges,2)
    cross = e2[None, :, 0] * rel[:, :, 1] - e2[None, :, 1] * rel[:, :, 0]
    valid_b = (jnp.all(cross >= -tol, axis=1) |
               jnp.all(cross <= tol, axis=1))

    # (c) 2D intersections: 4 rect edges x 4 quad edges
    ra = jnp.stack([jnp.stack([hu, -hv]), jnp.stack([hu, hv]),
                    jnp.stack([-hu, hv]), jnp.stack([-hu, -hv])])  # (4,2)
    rd = jnp.roll(ra, -1, axis=0) - ra                 # rect edge vectors
    d2v = e2                                           # quad edge vectors
    # solve ra + ta*rd = q2 + tb*d2 for each of the 16 combos
    diff = q2[None, :, :] - ra[:, None, :]             # (4,4,2)
    denom = rd[:, None, 0] * d2v[None, :, 1] - rd[:, None, 1] * d2v[None, :, 0]
    denom_safe = jnp.where(jnp.abs(denom) < eps, 1.0, denom)
    ta = (diff[:, :, 0] * d2v[None, :, 1] -
          diff[:, :, 1] * d2v[None, :, 0]) / denom_safe
    tb = (diff[:, :, 0] * rd[:, None, 1] -
          diff[:, :, 1] * rd[:, None, 0]) / denom_safe
    valid_c = ((jnp.abs(denom) >= eps) & (ta >= -tol) & (ta <= 1 + tol) &
               (tb >= -tol) & (tb <= 1 + tol)).reshape(-1)
    uc = (ra[:, None, 0] + ta * rd[:, None, 0]).reshape(-1)
    vc = (ra[:, None, 1] + ta * rd[:, None, 1]).reshape(-1)
    wc = plane_w(uc, vc)

    u_all = jnp.concatenate([ua, ub, uc])
    v_all = jnp.concatenate([va, vb, vc])
    w_all = jnp.concatenate([wa, wb, wc])
    valid = jnp.concatenate([valid_a, valid_b, valid_c])
    gap = s * w_all - hw                               # penetration along n_l
    gap = jnp.where(valid, gap, _BIG)

    neg_gap, idx = jax.lax.top_k(-gap, 4)
    dist = -neg_gap
    u4, v4, w4 = u_all[idx], v_all[idx], w_all[idx]
    # contact point: midway between the two surfaces along the face axis
    wmid = 0.5 * (s * hw + w4)
    pos_local = jnp.stack([u4, v4, wmid], axis=-1) @ P  # back to ref local
    return sep_best, dist, pos_local, n_l


def box_box(p1, m1, half1, p2, m2, half2):
    """Box geom1 vs box geom2 (SAT + clipped face manifold). 4 contacts.

    Covers the blocks env's 28 block-block pairs that MuJoCo collides in the
    reference model (reference envs/assets/half_cheetah_blocks.xml:54-90).
    Face case: the deeper-face reference box wins; edge-edge case (best SAT
    axis an edge cross-product): single contact at the closest edge points.
    """
    dtype = p1.dtype
    half1 = half1[:3]
    half2 = half2[:3]

    # manifold with box1 as reference and with box2 as reference
    sep_1, d1, pl1, nl1 = _face_manifold(p1, m1, half1, p2, m2, half2)
    sep_2, d2, pl2, nl2 = _face_manifold(p2, m2, half2, p1, m1, half1)
    use2 = sep_2 > sep_1 + 1e-8
    dist = jnp.where(use2, d2, d1)
    pos = jnp.where(use2, pl2 @ m2.T + p2[None, :], pl1 @ m1.T + p1[None, :])
    # normal convention: from geom1 toward geom2
    n_face = jnp.where(use2, -(m2 @ nl2), m1 @ nl1)

    # --- edge-edge SAT (9 cross axes, box1 frame) ---
    R = m1.T @ m2
    t = m1.T @ (p2 - p1)
    eye = jnp.eye(3, dtype=dtype)
    # axes l[i,j] = cross(e_i, R[:, j])
    l = jnp.cross(eye[:, None, :], R.T[None, :, :])    # (3,3,3)
    lnorm = jnp.linalg.norm(l, axis=-1)
    ok = lnorm > 1e-6
    lhat = l / jnp.where(ok, lnorm, 1.0)[..., None]
    # orient toward box2
    tdot = jnp.einsum('ijk,k->ij', lhat, t)
    lhat = lhat * jnp.where(tdot >= 0, 1.0, -1.0)[..., None]
    tdot = jnp.abs(tdot)
    supp1 = jnp.einsum('ijk,k->ij', jnp.abs(lhat), half1)
    supp2 = jnp.einsum('ijl,l->ij', jnp.abs(jnp.einsum('ijk,kl->ijl',
                                                       lhat, R)), half2)
    sep_e = jnp.where(ok, tdot - supp1 - supp2, -_BIG)
    # penalize degenerate (near-parallel) axes; flatten and pick best
    flat = sep_e.reshape(-1)
    eidx = jnp.argmax(flat)
    sep_edge = flat[eidx]
    i = eidx // 3
    j = jnp.mod(eidx, 3)
    le = lhat.reshape(-1, 3)[eidx]                     # box1 frame, ->box2
    onei = _one_hot3(i, dtype)
    onejb = _one_hot3(j, dtype)
    # supporting edge on box1: corner signs toward +le on the other axes
    sgn1 = jnp.where(eye @ le >= 0, 1.0, -1.0) * (1.0 - onei)
    pA = (half1 * sgn1)                                # point on edge1 (local)
    dA = onei                                          # direction e_i
    hA = half1 @ onei
    # supporting edge on box2: toward -le along box2 axes
    le2 = R.T @ le                                     # le in box2 frame
    sgn2 = jnp.where(le2 >= 0, -1.0, 1.0) * (1.0 - onejb)
    pB = t + R @ (half2 * sgn2)
    dB = R @ onejb
    hB = half2 @ onejb
    # closest points between the two edge segments (box1 frame)
    s1a, s1b = pA - dA * hA, pA + dA * hA
    s2a, s2b = pB - dB * hB, pB + dB * hB
    dd1, dd2 = s1b - s1a, s2b - s2a
    rr = s1a - s2a
    a = jnp.dot(dd1, dd1)
    e = jnp.dot(dd2, dd2)
    f = jnp.dot(dd2, rr)
    c = jnp.dot(dd1, rr)
    b = jnp.dot(dd1, dd2)
    denom = jnp.maximum(a * e - b * b, 1e-12)
    ss = jnp.clip((b * f - c * e) / denom, 0.0, 1.0)
    tt = jnp.clip((b * ss + f) / jnp.maximum(e, 1e-12), 0.0, 1.0)
    ss = jnp.clip((b * tt - c) / jnp.maximum(a, 1e-12), 0.0, 1.0)
    q1 = s1a + ss * dd1
    q2e = s2a + tt * dd2
    pos_edge = p1 + m1 @ (0.5 * (q1 + q2e))
    n_edge = m1 @ le

    sep_face = jnp.maximum(sep_1, sep_2)
    is_edge = sep_edge > sep_face + 1e-8
    dist = jnp.where(is_edge,
                     jnp.concatenate([sep_edge[None],
                                      jnp.full((3,), _BIG, dtype)]), dist)
    pos = jnp.where(is_edge, jnp.concatenate(
        [pos_edge[None, :], jnp.zeros((3, 3), dtype)]), pos)
    n = jnp.where(is_edge,
                  jnp.broadcast_to(n_edge, (4, 3)),
                  jnp.broadcast_to(n_face, (4, 3)))
    # inert slots: keep normals unit to stay NaN-safe under masking
    inert = dist >= _BIG * 0.5
    n = jnp.where(inert[:, None],
                  jnp.broadcast_to(jnp.asarray([0., 0., 1.], dtype), (4, 3)),
                  n)
    return dist, pos, n
