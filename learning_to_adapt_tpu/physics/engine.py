"""Jittable articulated rigid-body dynamics engine.

TPU-native replacement for the MuJoCo 1.31 C pipeline the reference drives
through ctypes (`mj_step`/`mj_forward`, reference mujoco_py/mjcore.py:48-86).
One env step is one pure function `step(model, mm, state, ctrl)`; thousands of
env instances run in lockstep under `jax.vmap`, and across chips the batch
axis is sharded with pjit/shard_map (see parallel/).

Pipeline per step (all world-frame Pluecker spatial algebra, about origin):
  1. forward kinematics -> body frames, per-dof motion subspace `cdof`
  2. body spatial velocities, bias forces (RNE), mass matrix (CRBA)
  3. narrow-phase collisions on a static candidate-pair list
  4. soft-constraint assembly (contacts + joint limits, MuJoCo solref/solimp
     impedance model) and projected Gauss-Seidel
  5. semi-implicit Euler with implicit joint damping, or RK4

The static tree structure lives in numpy inside `PhysicsModel`; loops over
bodies/joints unroll at trace time, so XLA sees straight-line code over small
dense tensors — MXU-friendly batched matmuls once vmapped.
"""
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from learning_to_adapt_tpu.physics import collision as coll
from learning_to_adapt_tpu.physics import maths
from learning_to_adapt_tpu.physics.spec import (
    EULER, FREE, HINGE, RK4, SLIDE, MutableModel, PhysicsModel)


@jax.tree_util.register_dataclass
@dataclass
class PhysicsState:
    qpos: Any  # (nq,)
    qvel: Any  # (nv,)


@jax.tree_util.register_dataclass
@dataclass
class ForwardData:
    """Quantities derived from (qpos, qvel) that envs read for obs/reward.
    Mirrors the mjData fields the reference touches: xpos/xmat
    (mujoco_env.py:209-219), com_subtree (mjcore.py:54-83 `body_comvels`)."""
    xpos: Any           # (nbody,3) body frame origins, world
    xquat: Any          # (nbody,4)
    ximat: Any          # (nbody,3,3) rotation matrices
    subtree_com: Any    # (nbody,3)
    subtree_comvel: Any # (nbody,3)
    qfrc_actuator: Any  # (nv,)


def _fk(model: PhysicsModel, mm: MutableModel, qpos):
    """Forward kinematics. Returns xpos (nbody,3), xquat (nbody,4),
    cdof (nv,6) world-frame motion subspaces."""
    dtype = qpos.dtype
    eye3 = jnp.eye(3, dtype=dtype)
    xpos = [jnp.zeros(3, dtype)]
    xquat = [jnp.array([1., 0., 0., 0.], dtype)]
    cdof = [None] * model.nv

    # joints grouped per body in definition order
    body_joints = [[] for _ in range(model.nbody)]
    for ji in range(model.njnt):
        body_joints[int(model.jnt_body[ji])].append(ji)

    for b in range(1, model.nbody):
        p = int(model.body_parent[b])
        pos = xpos[p] + maths.quat_rotate(
            xquat[p], jnp.asarray(model.body_pos[b], dtype))
        quat = maths.quat_mul(xquat[p], jnp.asarray(model.body_quat[b], dtype))
        for ji in body_joints[b]:
            jt = int(model.jnt_type[ji])
            qadr = int(model.jnt_qposadr[ji])
            dadr = int(model.jnt_dofadr[ji])
            if jt == FREE:
                pos = qpos[qadr:qadr + 3]
                quat = maths.quat_normalize(qpos[qadr + 3:qadr + 7])
                r = maths.quat_to_mat(quat)
                for k in range(3):  # translational dofs, world axes
                    cdof[dadr + k] = jnp.concatenate(
                        [jnp.zeros(3, dtype), eye3[k]])
                for k in range(3):  # rotational dofs, body-local axes
                    axis_w = r[:, k]
                    cdof[dadr + 3 + k] = jnp.concatenate(
                        [axis_w, jnp.cross(pos, axis_w)])
            elif jt == SLIDE:
                axis_l = jnp.asarray(model.jnt_axis[ji], dtype)
                axis_w = maths.quat_rotate(quat, axis_l)
                pos = pos + axis_w * (qpos[qadr] - model.jnt_ref[ji])
                cdof[dadr] = jnp.concatenate([jnp.zeros(3, dtype), axis_w])
            elif jt == HINGE:
                axis_l = jnp.asarray(model.jnt_axis[ji], dtype)
                axis_w = maths.quat_rotate(quat, axis_l)
                anchor_w = pos + maths.quat_rotate(
                    quat, jnp.asarray(model.jnt_pos[ji], dtype))
                angle = qpos[qadr] - model.jnt_ref[ji]
                quat = maths.quat_mul(
                    quat, maths.axis_angle_to_quat(axis_l, angle))
                pos = anchor_w - maths.quat_rotate(
                    quat, jnp.asarray(model.jnt_pos[ji], dtype))
                cdof[dadr] = jnp.concatenate(
                    [axis_w, jnp.cross(anchor_w, axis_w)])
            else:
                raise ValueError(f'joint type {jt}')
        xpos.append(pos)
        xquat.append(quat)

    cdof = (jnp.stack(cdof) if model.nv else jnp.zeros((0, 6), dtype))
    return jnp.stack(xpos), jnp.stack(xquat), cdof


def _geom_frames(model, mm, xpos, ximat):
    """World frames of all geoms. geom_pos is runtime (Ant crippling moves
    geoms, reference ant_env.py:141-188)."""
    b = model.geom_body
    gpos = xpos[b] + jnp.einsum('gij,gj->gi', ximat[b], mm.geom_pos)
    gq = jnp.asarray(model.geom_quat, gpos.dtype)
    gmat = ximat[b] @ maths.quat_to_mat(gq)
    return gpos, gmat


def _mass_properties(model, mm, xpos, xquat, ximat):
    """World COM positions and world-frame spatial inertias per body."""
    dtype = xpos.dtype
    ipos = jnp.asarray(model.body_ipos, dtype)
    xipos = xpos + jnp.einsum('bij,bj->bi', ximat, ipos)
    inertia_l = jnp.asarray(model.body_inertia, dtype)
    inertia_w = ximat @ inertia_l @ jnp.swapaxes(ximat, -1, -2)
    ispatial = maths.spatial_inertia(mm.body_mass, xipos, inertia_w)
    return xipos, ispatial


def _contacts(model: PhysicsModel, mm: MutableModel, gpos, gmat):
    """Run all narrow-phase kernels over the static pair list.

    Returns per-candidate arrays: dist (n,), pos (n,3), normal (n,3),
    thint (n,3) plus static numpy metadata (body1, body2, mu, solref,
    solimp, margin, condim). thint is the friction-frame tangent hint —
    MuJoCo's capsule-plane collider aligns t1 with the capsule long axis
    (observed in mj contact.frame; tests/test_mujoco_crosscheck.py) — or
    zeros when the default frame applies.
    """
    dists, poss, normals, hints = [], [], [], []
    meta = dict(body1=[], body2=[], mu=[], solref=[], solimp=[], margin=[],
                condim=[])

    def push_meta(g1, g2, n_pts):
        for _ in range(n_pts):
            meta['body1'].append(int(model.geom_body[g1]))
            meta['body2'].append(int(model.geom_body[g2]))
            meta['mu'].append(max(model.geom_friction[g1][0],
                                  model.geom_friction[g2][0]))
            meta['solref'].append(0.5 * (model.geom_solref[g1] +
                                         model.geom_solref[g2]))
            meta['solimp'].append(0.5 * (model.geom_solimp[g1] +
                                         model.geom_solimp[g2]))
            # MuJoCo includemargin: the two geom margins ADD (each margin
            # expands its geom's surface; verified vs mj contact.includemargin
            # in tests/test_mujoco_crosscheck.py)
            meta['margin'].append(model.geom_margin[g1] +
                                  model.geom_margin[g2])
            meta['condim'].append(max(int(model.geom_condim[g1]),
                                      int(model.geom_condim[g2])))

    # each kind's kernel is vmapped over its (static) pair list: one fused
    # batched kernel per kind instead of one op-chain per pair
    for kind, pairs in model.pair_groups:
        i1 = pairs[:, 0]
        i2 = pairs[:, 1]
        p1, m1, s1 = gpos[i1], gmat[i1], mm.geom_size[i1]
        p2, m2, s2 = gpos[i2], gmat[i2], mm.geom_size[i2]
        if kind == 'plane_sphere':
            d, p, n = jax.vmap(coll.plane_sphere)(p1, m1, p2, s2[:, 0])
        elif kind == 'plane_capsule':
            d, p, n = jax.vmap(coll.plane_capsule)(p1, m1, p2, m2, s2[:, 0],
                                                   s2[:, 1])
        elif kind == 'hfield_sphere':
            d, p, n = jax.vmap(
                lambda a, b, c: coll.hfield_sphere(
                    a, mm.hfield_size, mm.hfield_row, b, c))(p1, p2, s2[:, 0])
        elif kind == 'hfield_capsule':
            d, p, n = jax.vmap(
                lambda a, b, c, r, h: coll.hfield_capsule(
                    a, mm.hfield_size, mm.hfield_row, b, c, r, h))(
                p1, p2, m2, s2[:, 0], s2[:, 1])
        elif kind == 'sphere_sphere':
            d, p, n = jax.vmap(coll.sphere_sphere)(p1, s1[:, 0], p2, s2[:, 0])
        elif kind == 'sphere_capsule':
            d, p, n = jax.vmap(coll.sphere_capsule)(p1, s1[:, 0], p2, m2,
                                                    s2[:, 0], s2[:, 1])
        elif kind == 'capsule_capsule':
            d, p, n = jax.vmap(coll.capsule_capsule)(p1, m1, s1[:, 0],
                                                     s1[:, 1], p2, m2,
                                                     s2[:, 0], s2[:, 1])
        elif kind == 'capsule_box':
            d, p, n = jax.vmap(coll.capsule_box)(p1, m1, s1[:, 0], s1[:, 1],
                                                 p2, m2, s2[:, :3])
        elif kind == 'sphere_box':
            d, p, n = jax.vmap(coll.sphere_box)(p1, s1[:, 0], p2, m2,
                                                s2[:, :3])
        elif kind == 'box_box':
            d, p, n = jax.vmap(coll.box_box)(p1, m1, s1[:, :3], p2, m2,
                                             s2[:, :3])
        else:
            raise ValueError(kind)
        n_pts = d.shape[1]
        dists.append(d.reshape(-1))
        poss.append(p.reshape(-1, 3))
        normals.append(n.reshape(-1, 3))
        if kind in ('plane_capsule', 'hfield_capsule'):
            h = jnp.repeat(m2[:, :, 2][:, None, :], n_pts, axis=1)
        else:
            h = jnp.zeros((len(pairs), n_pts, 3), gpos.dtype)
        hints.append(h.reshape(-1, 3))
        for g1, g2 in pairs:
            push_meta(int(g1), int(g2), n_pts)

    if not dists:
        z = jnp.zeros((0,), gpos.dtype)
        return z, z.reshape(0, 3), z.reshape(0, 3), z.reshape(0, 3), {
            k: np.zeros((0,) + np.shape(v[:1])[1:]) for k, v in meta.items()}
    meta = {k: np.asarray(v) for k, v in meta.items()}
    return (jnp.concatenate(dists), jnp.concatenate(poss),
            jnp.concatenate(normals), jnp.concatenate(hints), meta)


def _point_jacobian(model, cdof, body, point):
    """(nv,3) jacobian of world `point` fixed to `body`."""
    lin = cdof[:, 3:] + jnp.cross(cdof[:, :3], point[None, :])
    mask = jnp.asarray(model.body_dof[body], lin.dtype)
    return lin * mask[:, None]


def _impedance(solimp, r):
    """MuJoCo impedance d(r) in (0,1): rises dmin->dmax over `width` of
    penetration along the power curve y = a*x^p / 1-b*(1-x)^p split at
    midpoint 0.5 with power 2 (the MuJoCo solimp defaults; none of the
    reference XMLs override them). r <= 0 when violated. Cross-validated
    against open-source MuJoCo in tests/test_mujoco_crosscheck.py."""
    dmin, dmax, width = solimp[..., 0], solimp[..., 1], solimp[..., 2]
    mid, p = 0.5, 2.0
    x = jnp.clip(-r / jnp.maximum(width, 1e-10), 0.0, 1.0)
    a_c = 1.0 / mid ** (p - 1.0)
    b_c = 1.0 / (1.0 - mid) ** (p - 1.0)
    s = jnp.where(x <= mid, a_c * x ** p, 1.0 - b_c * (1.0 - x) ** p)
    return jnp.clip(dmin + (dmax - dmin) * s, 1e-4, 0.9999)


def _kb(solref, solimp, d, dt):
    """Stiffness/damping of the virtual constraint spring. Exact MuJoCo
    solref=(timeconst, dampratio) semantics: b = 2/(dmax*tc),
    k = d / (dmax^2 * tc^2 * dr^2) with dmax = solimp[1], and tc clamped
    to >= 2*timestep exactly as MuJoCo does (cross-validated against
    open-source MuJoCo efc_KBIP in tests/test_mujoco_crosscheck.py)."""
    tc, dr = solref[..., 0], solref[..., 1]
    tc = jnp.maximum(tc, 2.0 * dt)
    dmax = solimp[..., 1]
    b = 2.0 / jnp.maximum(dmax * tc, 1e-8)
    k = d / jnp.maximum(dmax * dmax * tc * tc * dr * dr, 1e-10)
    return k, b


def _tangent_frame(n):
    """Two unit tangents orthogonal to n, branch-free."""
    ref = jnp.where(jnp.abs(n[..., 0:1]) < 0.5,
                    jnp.broadcast_to(jnp.array([1., 0., 0.], n.dtype), n.shape),
                    jnp.broadcast_to(jnp.array([0., 1., 0.], n.dtype), n.shape))
    t1 = jnp.cross(n, ref)
    t1 = t1 / jnp.linalg.norm(t1, axis=-1, keepdims=True)
    t2 = jnp.cross(n, t1)
    return t1, t2


def _actuator_force(model: PhysicsModel, ctrl, dtype):
    """Generalized actuator force: motor gear torque with ctrl clamped to
    ctrlrange, scattered onto the actuated dofs (mj qfrc_actuator)."""
    qfrc = jnp.zeros(model.nv, dtype)
    if model.nu:
        lo = jnp.asarray(model.act_ctrlrange[:, 0], dtype)
        hi = jnp.asarray(model.act_ctrlrange[:, 1], dtype)
        torque = jnp.clip(ctrl, lo, hi) * jnp.asarray(model.act_gear, dtype)
        qfrc = qfrc.at[model.act_dofadr].add(torque)
    return qfrc


def smooth_dynamics(model: PhysicsModel, mm: MutableModel, state: PhysicsState,
                    ctrl):
    """Everything except constraints: returns (M, qfrc_smooth, aux dict)."""
    dtype = state.qpos.dtype
    qpos, qvel = state.qpos, state.qvel

    xpos, xquat, cdof = _fk(model, mm, qpos)
    ximat = maths.quat_to_mat(xquat)
    xipos, ispatial = _mass_properties(model, mm, xpos, xquat, ximat)

    body_dof = jnp.asarray(model.body_dof, dtype)      # (nbody, nv)
    body_anc = jnp.asarray(model.body_ancestor, dtype) # (nbody, nbody)

    # body spatial velocities
    vel_dof = cdof * qvel[:, None]                     # (nv,6)
    body_vel = body_dof @ vel_dof                      # (nbody,6)

    # bias accelerations & forces (RNE with qacc=0, gravity as base accel).
    # d(cdof)/dt = v x cdof with v the velocity of the frame the dof's axis is
    # fixed in: the child body for hinge and free-rotational dofs, the parent
    # frame for slide and free-translational dofs (axes do not rotate with the
    # child). Using the child for all dofs produces a spurious -m*(w x v)
    # force on spinning free bodies.
    a_grav = jnp.concatenate([jnp.zeros(3, dtype),
                              -jnp.asarray(model.gravity, dtype)])
    vdot_dof = maths.motion_cross(body_vel[model.dof_vsrc], vel_dof)  # (nv,6)
    body_acc = body_dof @ vdot_dof + a_grav            # (nbody,6)
    iv = jnp.einsum('bij,bj->bi', ispatial, body_vel)
    f_bias = (jnp.einsum('bij,bj->bi', ispatial, body_acc) +
              maths.motion_cross_force(body_vel, iv))  # (nbody,6)
    qfrc_bias = jnp.einsum('bk,bi,ki->k', body_dof, f_bias, cdof)

    # CRBA mass matrix
    ic = jnp.einsum('ab,bij->aij', body_anc, ispatial) # composite inertias
    f_crb = jnp.einsum('kij,kj->ki', ic[model.dof_body], cdof)  # (nv,6)
    m_raw = cdof @ f_crb.T                             # (nv,nv)
    anc = jnp.asarray(model.dof_ancestor, dtype)
    m_upper = m_raw * anc
    mass_mat = m_upper + m_upper.T - jnp.diag(jnp.diag(m_upper))
    mass_mat = mass_mat + jnp.diag(jnp.asarray(model.dof_armature, dtype))

    # passive: joint springs + damping
    qfrc_passive = -mm.dof_damping * qvel
    for ji in range(model.njnt):
        if model.jnt_stiffness[ji] > 0 and model.jnt_type[ji] != FREE:
            qadr, dadr = int(model.jnt_qposadr[ji]), int(model.jnt_dofadr[ji])
            k = model.jnt_stiffness[ji]
            qfrc_passive = qfrc_passive.at[dadr].add(
                -k * (qpos[qadr] - model.jnt_springref[ji]))

    # actuation: motor gear torque with ctrl clamped to ctrlrange
    qfrc_actuator = _actuator_force(model, ctrl, dtype)

    # external wrenches (xfrc_applied: (force, torque) at body COM — the Arm
    # 'force' task surface, reference arm_7dof_env.py:124-130)
    frc = mm.xfrc_applied[:, :3]
    trq = mm.xfrc_applied[:, 3:]
    f_ext = jnp.concatenate([trq + jnp.cross(xipos, frc), frc], axis=-1)
    qfrc_applied = jnp.einsum('bk,bi,ki->k', body_dof, f_ext, cdof)

    qfrc_smooth = qfrc_actuator + qfrc_passive + qfrc_applied - qfrc_bias

    aux = dict(xpos=xpos, xquat=xquat, ximat=ximat, cdof=cdof, xipos=xipos,
               body_vel=body_vel, qfrc_actuator=qfrc_actuator)
    return mass_mat, qfrc_smooth, aux


def constraint_forces(model: PhysicsModel, mm: MutableModel,
                      state: PhysicsState, mass_mat, qfrc_smooth, aux):
    """Joint limits + contacts via MuJoCo-style soft constraints and PGS.
    Returns qfrc_constraint (nv,)."""
    dtype = state.qpos.dtype
    qvel = state.qvel
    cdof = aux['cdof']

    # ---- static row structure (numpy, computed at trace time) ----
    # joint limit rows: two per limited joint; J is a constant +-one-hot
    lim_qadr, lim_sign, lim_bound, lim_j, lim_dadr = [], [], [], [], []
    lim_solref, lim_solimp = [], []
    for ji in range(model.njnt):
        if not model.jnt_limited[ji] or model.jnt_type[ji] == FREE:
            continue
        qadr, dadr = int(model.jnt_qposadr[ji]), int(model.jnt_dofadr[ji])
        lo, hi = model.jnt_range[ji]
        for sign, bound in ((1.0, lo), (-1.0, hi)):
            lim_qadr.append(qadr)
            lim_sign.append(sign)
            lim_bound.append(bound)
            lim_dadr.append(dadr)
            row = np.zeros(model.nv)
            row[dadr] = sign
            lim_j.append(row)
            lim_solref.append(model.jnt_solref_limit[ji])
            lim_solimp.append(model.jnt_solimp_limit[ji])
    nlim = len(lim_qadr)

    # ---- contacts (vectorized narrow phase) ----
    gpos, gmat = _geom_frames(model, mm, aux['xpos'], aux['ximat'])
    dist, pos, normal, thint, cmeta = _contacts(model, mm, gpos, gmat)
    ncon = dist.shape[0]
    if nlim == 0 and ncon == 0:
        return jnp.zeros(model.nv, dtype)

    # Every row is a non-negative force direction (MuJoCo pyramidal
    # formulation): limits and frictionless contact normals directly, and
    # condim>=3 contacts as 4 pyramid facets J = Jn +- mu*Jt_i. All-f>=0
    # projection keeps the solver branch-free — TPU-friendlier than coupled
    # cone clipping, and it is exactly MuJoCo's default cone (cross-validated
    # against open-source MuJoCo efc_J rows, tests/test_mujoco_crosscheck.py).
    rows_j, rows_r, rows_active = [], [], []
    solref_np, solimp_np, da_np = [], [], []

    if nlim:
        q_l = state.qpos[np.asarray(lim_qadr)]
        r_lim = np.asarray(lim_sign) * (q_l - np.asarray(lim_bound))
        rows_j.append(jnp.asarray(np.stack(lim_j), dtype))
        rows_r.append(r_lim.astype(dtype))
        rows_active.append(r_lim < 0.0)
        solref_np.extend(lim_solref)
        solimp_np.extend(lim_solimp)
        # regularizer weights are MuJoCo's compile-time constants, not the
        # exact current-state A_ii (mj_diagApprox semantics)
        da_np.extend(model.dof_invweight0[dadr] for dadr in lim_dadr)

    if ncon:
        # point jacobians for ALL contacts in one shot:
        # Jp[c, k, :] = (cdof_lin[k] + cdof_ang[k] x pos[c]) * mask_diff[c, k]
        bd = model.body_dof.astype(np.float64)
        mask_diff = (bd[cmeta['body2']] - bd[cmeta['body1']])  # (ncon, nv)
        jp = (cdof[None, :, 3:] +
              jnp.cross(cdof[None, :, :3], pos[:, None, :]))
        jp = jp * jnp.asarray(mask_diff, dtype)[:, :, None]    # (ncon,nv,3)

        j_n = jnp.einsum('cki,ci->ck', jp, normal)             # (ncon, nv)
        # MuJoCo constraint position for contacts: dist - includemargin
        # (both the spring and the impedance use it; verified vs mj
        # efc_KBIP/efc_aref in tests/test_mujoco_crosscheck.py)
        r_con = dist - jnp.asarray(cmeta['margin'], dtype)
        act_con = r_con < 0.0
        w12 = (model.body_invweight0[cmeta['body1']] +
               model.body_invweight0[cmeta['body2']])          # (ncon,) np

        one_c = np.nonzero(cmeta['condim'] < 3)[0]
        if one_c.size:
            rows_j.append(j_n[one_c])
            rows_r.append(r_con[one_c])
            rows_active.append(act_con[one_c])
            solref_np.extend(list(cmeta['solref'][one_c]))
            solimp_np.extend(list(cmeta['solimp'][one_c]))
            da_np.extend(list(w12[one_c]))

        pyr_c = np.nonzero(cmeta['condim'] >= 3)[0]
        if pyr_c.size:
            n_p = normal[pyr_c]
            t1, t2 = _tangent_frame(n_p)
            # align t1 with the collider's tangent hint (capsule long axis
            # projected into the contact plane) when one exists — matches
            # MuJoCo's capsule contact frames, which orient the friction
            # pyramid
            h = thint[pyr_c]
            hp = h - jnp.sum(h * n_p, -1, keepdims=True) * n_p
            hn = jnp.linalg.norm(hp, axis=-1, keepdims=True)
            use = hn > 1e-6
            t1 = jnp.where(use, hp / jnp.maximum(hn, 1e-12), t1)
            t2 = jnp.cross(n_p, t1)
            jp_f = jp[pyr_c]
            j_t1 = jnp.einsum('cki,ci->ck', jp_f, t1)
            j_t2 = jnp.einsum('cki,ci->ck', jp_f, t2)
            mu_p = jnp.asarray(cmeta['mu'][pyr_c], dtype)[:, None]
            jn_p = j_n[pyr_c]
            facets = jnp.stack(
                [jn_p + mu_p * j_t1, jn_p - mu_p * j_t1,
                 jn_p + mu_p * j_t2, jn_p - mu_p * j_t2],
                axis=1)                                        # (npyr,4,nv)
            rows_j.append(facets.reshape(-1, model.nv))
            rows_r.append(jnp.repeat(r_con[pyr_c], 4))
            rows_active.append(jnp.repeat(act_con[pyr_c], 4))
            solref_np.extend(list(np.repeat(cmeta['solref'][pyr_c], 4,
                                            axis=0)))
            solimp_np.extend(list(np.repeat(cmeta['solimp'][pyr_c], 4,
                                            axis=0)))
            mu_np = cmeta['mu'][pyr_c]
            da_np.extend(list(np.repeat(
                2.0 * mu_np ** 2 * (1.0 + mu_np ** 2) * w12[pyr_c], 4)))

    J = jnp.concatenate(rows_j, axis=0)          # (nrows, nv)
    r_pos = jnp.concatenate(rows_r)
    active = jnp.concatenate(rows_active)
    solref = jnp.asarray(np.asarray(solref_np), dtype)
    solimp = jnp.asarray(np.asarray(solimp_np), dtype)
    dA = jnp.asarray(np.asarray(da_np, np.float64), dtype)
    nrows = int(J.shape[0])

    J = J * active[:, None]
    chol = jax.scipy.linalg.cho_factor(mass_mat)
    minv_jt = jax.scipy.linalg.cho_solve(chol, J.T)       # (nv, nrows)

    # impedance, spring params
    d = _impedance(solimp, r_pos)
    k, b = _kb(solref, solimp, d, model.timestep)
    vel = J @ qvel
    aref = (-b * vel - k * r_pos) * active

    # A = J M^-1 J^T + diag(R), R from impedance and compile-time weights
    A = J @ minv_jt
    R = jnp.maximum((1.0 - d) / jnp.maximum(d, 1e-10) * dA, 1e-12)
    R = jnp.where(active, R, 1.0)
    A = A + jnp.diag(R)
    a_ii_inv = 1.0 / jnp.clip(jnp.diag(A), 1e-12, None)

    qacc_smooth = jax.scipy.linalg.cho_solve(chol, qfrc_smooth)
    b_vec = (J @ qacc_smooth - aref) * active

    if model.solver == 'jacobi':
        # projected Jacobi with adaptive under-relaxation: every sweep is
        # ONE batched matvec (MXU-friendly; no sequential row scan inside
        # the step). omega = 1/rho with rho the row-sum bound on the
        # spectral radius of D^-1 A guarantees contraction of the linear
        # part even on strongly-coupled stacks (the blocks env's box piles
        # diverge under a fixed omega); for well-conditioned contact sets
        # rho ~ 1 so omega ~ 1 and convergence is faster than fixed 0.5.
        rho = jnp.max(jnp.sum(jnp.abs(A), axis=1) * a_ii_inv)
        omega = jnp.minimum(jnp.asarray(1.0, dtype),
                            1.8 / jnp.maximum(rho, 1e-10))

        # NB a fused Pallas VMEM kernel for this sweep chain was built and
        # measured at 0.64x XLA (benchmarks/bench_pallas_jacobi.py,
        # docs/DESIGN.md) — XLA's fori_loop wins; no dispatch gate here.
        def sweep(_, f):
            return jnp.maximum(f - omega * (A @ f + b_vec) * a_ii_inv, 0.0)

        f0 = jnp.zeros(nrows, dtype)
        f = jax.lax.fori_loop(0, 2 * model.iterations, sweep, f0)
    else:
        # projected Gauss-Seidel: lax.scan over rows inside fori over sweeps
        def sweep(_, f):
            def row(f, xs):
                a_row, b_i, aii_inv, i = xs
                fi = jnp.maximum(f[i] - (a_row @ f + b_i) * aii_inv, 0.0)
                return f.at[i].set(fi), None

            f, _ = jax.lax.scan(row, f,
                                (A, b_vec, a_ii_inv, jnp.arange(nrows)))
            return f

        f0 = jnp.zeros(nrows, dtype)
        f = jax.lax.fori_loop(0, model.iterations, sweep, f0)
    f = f * active

    return J.T @ f


def _integrate_pos(model: PhysicsModel, qpos, qvel, dt):
    """qpos <- qpos (+) dt*qvel handling quaternion joints."""
    out = []
    for ji in range(model.njnt):
        jt = int(model.jnt_type[ji])
        qadr = int(model.jnt_qposadr[ji])
        dadr = int(model.jnt_dofadr[ji])
        if jt == FREE:
            out.append(qpos[qadr:qadr + 3] + dt * qvel[dadr:dadr + 3])
            out.append(maths.quat_integrate(
                qpos[qadr + 3:qadr + 7], qvel[dadr + 3:dadr + 6], dt))
        else:
            out.append(qpos[qadr:qadr + 1] + dt * qvel[dadr:dadr + 1])
    return jnp.concatenate(out) if out else qpos


def _qacc(model, mm, state, ctrl, implicit_damping):
    mass_mat, qfrc_smooth, aux = smooth_dynamics(model, mm, state, ctrl)
    qfrc_con = constraint_forces(model, mm, state, mass_mat, qfrc_smooth, aux)
    if implicit_damping:
        # (M + h*D) qacc = qfrc gives the velocity update of implicit-in-
        # damping Euler (MuJoCo 'Euler' integrator semantics)
        mass_int = mass_mat + model.timestep * jnp.diag(mm.dof_damping)
    else:
        mass_int = mass_mat
    # mass matrix is SPD: Cholesky solve (batched-friendly on TPU, unlike LU)
    qacc = jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(mass_int), qfrc_smooth + qfrc_con)
    return qacc


def step(model: PhysicsModel, mm: MutableModel, state: PhysicsState,
         ctrl) -> PhysicsState:
    """Advance one physics timestep (the `mj_step` equivalent)."""
    h = model.timestep
    if model.integrator == EULER:
        qacc = _qacc(model, mm, state, ctrl, implicit_damping=True)
        qvel = state.qvel + h * qacc
        qpos = _integrate_pos(model, state.qpos, qvel, h)
        return PhysicsState(qpos=qpos, qvel=qvel)
    elif model.integrator == RK4:
        def deriv(s):
            return s.qvel, _qacc(model, mm, s, ctrl, implicit_damping=False)
        v1, a1 = deriv(state)
        s2 = PhysicsState(_integrate_pos(model, state.qpos, v1, 0.5 * h),
                          state.qvel + 0.5 * h * a1)
        v2, a2 = deriv(s2)
        s3 = PhysicsState(_integrate_pos(model, state.qpos, v2, 0.5 * h),
                          state.qvel + 0.5 * h * a2)
        v3, a3 = deriv(s3)
        s4 = PhysicsState(_integrate_pos(model, state.qpos, v3, h),
                          state.qvel + h * a3)
        v4, a4 = deriv(s4)
        v_avg = (v1 + 2 * v2 + 2 * v3 + v4) / 6.0
        a_avg = (a1 + 2 * a2 + 2 * a3 + a4) / 6.0
        qpos = _integrate_pos(model, state.qpos, v_avg, h)
        qvel = state.qvel + h * a_avg
        return PhysicsState(qpos=qpos, qvel=qvel)
    raise ValueError(f'integrator {model.integrator}')


def energy(model: PhysicsModel, mm: MutableModel, state: PhysicsState):
    """(potential, kinetic) — mj_energy parity (reference mjcore.py:50-51
    calls mj_sensor+mj_energy every forward; none of the five reference
    models defines <sensor> elements, so mj_sensor is a no-op for them and
    energy is the only observable output of that pair).

    potential = -sum_i m_i g . com_i + 0.5 sum_j k_j (q_j - springref_j)^2
    kinetic   = 0.5 qvel^T M qvel   (CRBA mass matrix incl. armature)
    """
    dtype = state.qpos.dtype
    mass_mat, _, aux = smooth_dynamics(model, mm, state,
                                       jnp.zeros(model.nu, dtype))
    grav = jnp.asarray(model.gravity, dtype)
    pot = -jnp.sum(mm.body_mass * (aux['xipos'] @ grav))
    for ji in range(model.njnt):
        if model.jnt_stiffness[ji] > 0 and model.jnt_type[ji] != FREE:
            qadr = int(model.jnt_qposadr[ji])
            dq = state.qpos[qadr] - model.jnt_springref[ji]
            pot = pot + 0.5 * model.jnt_stiffness[ji] * dq * dq
    kin = 0.5 * state.qvel @ mass_mat @ state.qvel
    return pot, kin


def forward(model: PhysicsModel, mm: MutableModel,
            state: PhysicsState, ctrl=None) -> ForwardData:
    """Position/velocity-stage forward pass (the `mj_forward` subset envs
    consume for observations and rewards). `ctrl` fills qfrc_actuator the
    way mj_forward fills it from d->ctrl; omitted ctrl means zero force."""
    dtype = state.qpos.dtype
    xpos, xquat, cdof = _fk(model, mm, state.qpos)
    ximat = maths.quat_to_mat(xquat)
    xipos, _ = _mass_properties(model, mm, xpos, xquat, ximat)

    body_dof = jnp.asarray(model.body_dof, dtype)
    body_anc = jnp.asarray(model.body_ancestor, dtype)
    body_vel = body_dof @ (cdof * state.qvel[:, None])

    mass = mm.body_mass
    subtree_mass = body_anc @ mass
    safe_mass = jnp.maximum(subtree_mass, 1e-10)
    subtree_com = (body_anc @ (mass[:, None] * xipos)) / safe_mass[:, None]
    vcom = maths.point_velocity(body_vel, xipos)
    subtree_comvel = (body_anc @ (mass[:, None] * vcom)) / safe_mass[:, None]

    qfrc_act = (jnp.zeros(model.nv, dtype) if ctrl is None
                else _actuator_force(model, ctrl, dtype))
    return ForwardData(xpos=xpos, xquat=xquat, ximat=ximat,
                       subtree_com=subtree_com, subtree_comvel=subtree_comvel,
                       qfrc_actuator=qfrc_act)
