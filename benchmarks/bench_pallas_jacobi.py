"""Decision benchmark: XLA fori_loop vs the Pallas VMEM kernel for the
projected-Jacobi contact solve (ops/pallas_jacobi.py).

RECORDED VERDICT (TPU v5e, 2026-08-21, run with the engine-integrated
dispatch branch that round 3 subsequently removed): measured inside the
full latency-bound physics chain — jitted lax.scan of K dependent
half-cheetah steps for 5 envs, K vs 2K differenced so dispatch overhead
cancels — XLA 83.4 us/step vs Pallas 130.1 us/step (**0.64x, XLA wins**),
trajectories bit-identical after 50 steps. The engine therefore keeps the
plain fori_loop with no dispatch gate.

This file remains runnable as a solver-level comparison: a chain of K
dependent solves (each solve's output feeds the next right-hand side) at
the cheetah's constraint shapes, timed with the same K-vs-2K differencing.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

from learning_to_adapt_tpu.ops import pallas_jacobi  # noqa: E402

N = 76        # cheetah constraint rows
B = 5         # canonical env count
SWEEPS = 60   # 2 * model.iterations
K = 50


def make_problem(seed):
    rng = np.random.RandomState(seed)
    m = rng.randn(B, N, N).astype(np.float32)
    a = m @ m.transpose(0, 2, 1) + np.eye(N, dtype=np.float32) * N
    b = rng.randn(B, N).astype(np.float32)
    aii_inv = 1.0 / np.einsum('bii->bi', a)
    rho = np.max(np.sum(np.abs(a), axis=2) * aii_inv, axis=1)
    omega = np.minimum(1.0, 1.8 / rho).astype(np.float32)
    return (jnp.asarray(a), jnp.asarray(b), jnp.asarray(aii_inv),
            jnp.asarray(omega))


def build_chain(solve, n_links):
    @jax.jit
    def chain(a, b, aii_inv, omega):
        def link(b_cur, _):
            f = jax.vmap(lambda A, bb, ai, om: solve(A, bb, ai, om, SWEEPS)
                         )(a, b_cur, aii_inv, omega)
            return b_cur * 0.5 - f * 0.5, f
        b_fin, fs = jax.lax.scan(link, b, None, length=n_links)
        return b_fin, fs[-1]
    return chain


def timed(fn, args, n=15):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return out, min(ts)


def main():
    prob = make_problem(0)
    results = {}
    for name, solve in (('xla', pallas_jacobi.jacobi_solve_xla),
                        ('pallas', pallas_jacobi.jacobi_solve)):
        c1 = build_chain(solve, K)
        c2 = build_chain(solve, 2 * K)
        out1, t1 = timed(c1, prob)
        out2, t2 = timed(c2, prob)
        per = (t2 - t1) / K
        results[name] = (per, out1)
        print(f'{name}: chain{K}={t1 * 1e3:.2f}ms chain{2 * K}='
              f'{t2 * 1e3:.2f}ms -> {per * 1e6:.1f} us/solve '
              f'(batch {B}, {SWEEPS} sweeps, N={N})', flush=True)

    err = float(jnp.max(jnp.abs(results['xla'][1][1] -
                                results['pallas'][1][1])))
    print(f'speedup={results["xla"][0] / results["pallas"][0]:.3f}x '
          f'max|f diff|={err:.2e}')
    return 0 if err < 1e-3 else 1


if __name__ == '__main__':
    sys.exit(main())
