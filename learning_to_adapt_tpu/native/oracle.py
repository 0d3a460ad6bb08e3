"""ctypes binding for the native C++ physics oracle (native/ltao_physics.cc).

The oracle is a float64 CPU mirror of the jitted engine
(physics/engine.py) playing the role libmujoco131.so played for the
reference (loaded through ctypes exactly like reference
mujoco_py/mjlib.py:8-17): an independent implementation to validate
trajectories against, and a zero-JIT-latency single-env stepper for
host-side replay (experiment_utils/sim_policy.py).

The shared library is compiled on demand with g++ (cached next to the
source); no prebuilt binaries are committed.
"""
import ctypes
import hashlib
import os
import subprocess

import numpy as np

from learning_to_adapt_tpu.physics.spec import (
    MutableModel, PhysicsModel, default_mutable)

# pair-kind codes — must match enum PairKind in native/ltao_physics.cc
KIND_CODES = {
    'plane_sphere': 0, 'plane_capsule': 1, 'hfield_sphere': 2,
    'hfield_capsule': 3, 'sphere_sphere': 4, 'sphere_capsule': 5,
    'capsule_capsule': 6, 'capsule_box': 7, 'sphere_box': 8, 'box_box': 9,
}

_SOLVER_CODES = {'jacobi': 0, 'pgs': 1}

_lib = None


def _source_path():
    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(os.path.dirname(here))
    return os.path.join(repo, 'native', 'ltao_physics.cc')


def _build(src):
    # staleness by content hash, not mtime: a fresh clone gives every file
    # the same checkout time, which an mtime check can't distinguish
    out = os.path.join(os.path.dirname(src), 'libltao_physics.so')
    stamp = out + '.sha256'
    with open(src, 'rb') as f:
        digest = hashlib.sha256(f.read()).hexdigest()
    current = None
    if os.path.exists(stamp):
        with open(stamp) as f:
            current = f.read().strip()
    if not os.path.exists(out) or current != digest:
        # concurrent-build safe: compile to a per-process temp name, then
        # os.rename into place (atomic on one filesystem) — two processes
        # that both see a stale stamp never leave a half-written .so for a
        # third to dlopen; the stamp is written only after the rename
        tmp = f'{out}.{os.getpid()}.tmp'
        try:
            subprocess.run(
                ['g++', '-O2', '-shared', '-fPIC', '-std=c++17', '-o', tmp,
                 src],
                check=True, capture_output=True)
            os.rename(tmp, out)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        with open(stamp, 'w') as f:
            f.write(digest)
    return out


def load_library():
    """Compile (if stale) and load the oracle; raises if g++ is missing."""
    global _lib
    if _lib is not None:
        return _lib
    path = _build(_source_path())
    lib = ctypes.CDLL(path)
    lib.ltao_model_new.restype = ctypes.c_void_p
    lib.ltao_model_free.argtypes = [ctypes.c_void_p]
    dptr = ctypes.POINTER(ctypes.c_double)
    lib.ltao_model_set.argtypes = [ctypes.c_void_p, ctypes.c_char_p, dptr,
                                   ctypes.c_long]
    lib.ltao_model_finalize.argtypes = [ctypes.c_void_p]
    lib.ltao_model_finalize.restype = ctypes.c_int
    lib.ltao_step.argtypes = ([ctypes.c_void_p] + [dptr] * 10 +
                              [ctypes.c_long, dptr, dptr])
    lib.ltao_step.restype = ctypes.c_int
    lib.ltao_forward.argtypes = [ctypes.c_void_p] + [dptr] * 8
    lib.ltao_forward.restype = ctypes.c_int
    _lib = lib
    return lib


def available():
    try:
        load_library()
        return True
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return False


def _as_f64(x):
    return np.ascontiguousarray(np.asarray(x, np.float64))


def _ptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class NativePhysics:
    """Native stepper for one compiled PhysicsModel.

    step(qpos, qvel, ctrl, mm=None)  -> (qpos', qvel')   one mj_step
    forward(qpos, qvel, mm=None)     -> dict(xpos, ximat, subtree_com,
                                             subtree_comvel)
    """

    def __init__(self, model: PhysicsModel):
        self._libref = load_library()
        self.model = model
        self._h = self._libref.ltao_model_new()

        def put(name, value):
            arr = _as_f64(value).reshape(-1)
            self._libref.ltao_model_set(
                self._h, name.encode(), _ptr(arr), arr.size)

        m = model
        for name, value in [
                ('nq', m.nq), ('nv', m.nv), ('nu', m.nu), ('nbody', m.nbody),
                ('ngeom', m.ngeom), ('njnt', m.njnt),
                ('timestep', m.timestep), ('gravity', m.gravity),
                ('integrator', m.integrator), ('iterations', m.iterations),
                ('solver', _SOLVER_CODES[m.solver]),
                ('body_parent', m.body_parent), ('body_pos', m.body_pos),
                ('body_quat', m.body_quat), ('body_ipos', m.body_ipos),
                ('body_inertia', m.body_inertia),
                ('jnt_type', m.jnt_type), ('jnt_body', m.jnt_body),
                ('jnt_pos', m.jnt_pos), ('jnt_axis', m.jnt_axis),
                ('jnt_range', m.jnt_range),
                ('jnt_limited', m.jnt_limited.astype(np.float64)),
                ('jnt_stiffness', m.jnt_stiffness),
                ('jnt_springref', m.jnt_springref), ('jnt_ref', m.jnt_ref),
                ('jnt_solref_limit', m.jnt_solref_limit),
                ('jnt_solimp_limit', m.jnt_solimp_limit),
                ('jnt_qposadr', m.jnt_qposadr), ('jnt_dofadr', m.jnt_dofadr),
                ('dof_body', m.dof_body), ('dof_vsrc', m.dof_vsrc),
                ('dof_armature', m.dof_armature),
                ('geom_body', m.geom_body), ('geom_quat', m.geom_quat),
                ('geom_friction', m.geom_friction),
                ('geom_margin', m.geom_margin),
                ('geom_solref', m.geom_solref),
                ('geom_solimp', m.geom_solimp),
                ('geom_condim', m.geom_condim),
                ('act_dofadr', m.act_dofadr), ('act_gear', m.act_gear),
                ('act_ctrlrange', m.act_ctrlrange),
                ('body_ancestor', m.body_ancestor.astype(np.float64)),
                ('dof_ancestor', m.dof_ancestor.astype(np.float64)),
                ('body_dof', m.body_dof.astype(np.float64)),
                ('dof_invweight0', m.dof_invweight0),
                ('body_invweight0', m.body_invweight0),
        ]:
            put(name, value)

        # candidate pairs flattened in engine iteration order (engine.py
        # _contacts walks model.pair_groups in order), so the constraint-row
        # layout — and therefore the solver trajectory — is identical
        kinds, g1s, g2s = [], [], []
        for kind, pairs in m.pair_groups:
            for a, b in pairs:
                kinds.append(KIND_CODES[kind])
                g1s.append(int(a))
                g2s.append(int(b))
        if kinds:
            put('pair_kind', kinds)
            put('pair_g1', g1s)
            put('pair_g2', g2s)

        if self._libref.ltao_model_finalize(self._h) != 0:
            raise RuntimeError('ltao_model_finalize failed: missing fields')

    def __del__(self):
        if getattr(self, '_h', None) and getattr(self, '_libref', None):
            self._libref.ltao_model_free(self._h)
            self._h = None

    def _mm(self, mm):
        if mm is None:
            mm = default_mutable(self.model, np.float64)
        return mm

    def step(self, qpos, qvel, ctrl, mm: MutableModel = None):
        mm = self._mm(mm)
        qpos = _as_f64(qpos)
        qvel = _as_f64(qvel)
        ctrl = _as_f64(ctrl) if self.model.nu else np.zeros(1)
        bm = _as_f64(mm.body_mass)
        dd = _as_f64(mm.dof_damping)
        gs = _as_f64(mm.geom_size)
        gp = _as_f64(mm.geom_pos)
        xf = _as_f64(mm.xfrc_applied)
        hs = _as_f64(mm.hfield_size)
        hr = _as_f64(mm.hfield_row)
        out_qpos = np.empty(self.model.nq, np.float64)
        out_qvel = np.empty(self.model.nv, np.float64)
        rc = self._libref.ltao_step(
            self._h, _ptr(qpos), _ptr(qvel), _ptr(ctrl), _ptr(bm), _ptr(dd),
            _ptr(gs), _ptr(gp), _ptr(xf), _ptr(hs), _ptr(hr), hr.size,
            _ptr(out_qpos), _ptr(out_qvel))
        if rc != 0:
            raise RuntimeError(f'ltao_step failed rc={rc}')
        return out_qpos, out_qvel

    def forward(self, qpos, qvel, mm: MutableModel = None):
        mm = self._mm(mm)
        qpos = _as_f64(qpos)
        qvel = _as_f64(qvel)
        bm = _as_f64(mm.body_mass)
        gp = _as_f64(mm.geom_pos)
        nb = self.model.nbody
        xpos = np.empty((nb, 3), np.float64)
        ximat = np.empty((nb, 3, 3), np.float64)
        com = np.empty((nb, 3), np.float64)
        comvel = np.empty((nb, 3), np.float64)
        rc = self._libref.ltao_forward(
            self._h, _ptr(qpos), _ptr(qvel), _ptr(bm), _ptr(gp),
            _ptr(xpos), _ptr(ximat), _ptr(com), _ptr(comvel))
        if rc != 0:
            raise RuntimeError(f'ltao_forward failed rc={rc}')
        return dict(xpos=xpos, ximat=ximat, subtree_com=com,
                    subtree_comvel=comvel)
