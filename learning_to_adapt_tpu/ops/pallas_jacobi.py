"""Pallas TPU kernel for the projected-Jacobi constraint solve.

The physics step's longest serial chain is the contact solver:
2*iterations (=60) dependent sweeps of

    f <- max(f - omega * (A @ f + b) * diag(A)^-1, 0)

over an (nrows, nrows) system (nrows = 76 for the cheetah: 8 capsule-plane
pairs x 2 candidates x 4 pyramid facets + joint limits; engine.py
constraint_forces). Each sweep is a tiny matvec — far below MXU tile size —
so the XLA fori_loop spends its time in per-iteration scheduling, not
arithmetic. This kernel runs the whole sweep chain inside ONE kernel with
A resident in VMEM: grid over the env batch, fori_loop over sweeps, one
(128,128)x(128,1) MXU op per sweep.

STATUS: benchmark-only. This is the round-3 attempt VERDICT.md asked for
on the latency-bound chain (the round-2 fused-MLP kernel lost to XLA on
the MXU-friendly planner batch — ops/fused_mlp.py). Measured by
benchmarks/bench_pallas_jacobi.py with device-serialized differenced
timing (K vs 2K dependent physics-step chains, 5 envs, TPU v5e):
XLA 83.4 us/step vs this kernel 130.1 us/step — **0.64x, XLA wins**, with
bit-identical trajectories after 50 steps. The (128,128)x(128,1) matvec
leaves the MXU pipeline mostly idle and the kernel boundary costs more
than XLA's fused while-loop saves, so the engine keeps the plain
fori_loop with no dispatch gate (docs/DESIGN.md section 1).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

_LANE = 128


def _round_up(n, m):
    return (n + m - 1) // m * m


def _kernel(n_sweeps, a_ref, b_ref, ainv_ref, omega_ref, out_ref):
    omega = omega_ref[0, 0]
    a = a_ref[:]
    b = b_ref[:]
    ainv = ainv_ref[:]

    def sweep(_, f):
        residual = jnp.dot(a, f, preferred_element_type=jnp.float32) + b
        return jnp.maximum(f - omega * residual * ainv, 0.0)

    f0 = jnp.zeros_like(b)
    out_ref[:] = jax.lax.fori_loop(0, n_sweeps, sweep, f0)


@functools.partial(jax.jit, static_argnames=('n_sweeps', 'interpret'))
def jacobi_solve(A, b, aii_inv, omega, n_sweeps, interpret=False):
    """f = projected-Jacobi solution of A f + b with under-relaxation omega.

    A: (N, N), b/aii_inv: (N,), omega: scalar. Matches the XLA reference
    loop in engine.constraint_forces bit-for-bit up to matmul accumulation
    order. Zero-padded rows/columns stay exactly zero through the
    iteration (0 - omega*(0+0)*0 clamps to 0).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = A.shape[-1]
    npad = _round_up(max(n, 8), _LANE)
    A_p = jnp.zeros((npad, npad), jnp.float32).at[:n, :n].set(A)
    b_p = jnp.zeros((npad, 1), jnp.float32).at[:n, 0].set(b)
    ainv_p = jnp.zeros((npad, 1), jnp.float32).at[:n, 0].set(aii_inv)
    omega_p = jnp.asarray(omega, jnp.float32).reshape(1, 1)

    f = pl.pallas_call(
        functools.partial(_kernel, int(n_sweeps)),
        out_shape=jax.ShapeDtypeStruct((npad, 1), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(A_p, b_p, ainv_p, omega_p)
    return f[:n, 0]


def jacobi_solve_xla(A, b, aii_inv, omega, n_sweeps):
    """The XLA reference loop (identical math; engine.py:514-518)."""
    def sweep(_, f):
        return jnp.maximum(f - omega * (A @ f + b) * aii_inv, 0.0)
    return jax.lax.fori_loop(0, n_sweeps, sweep, jnp.zeros_like(b))
