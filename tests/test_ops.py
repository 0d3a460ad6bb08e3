"""Pallas kernel tests (interpret mode on CPU; the real-hardware numeric
check runs in the TPU benchmarks)."""
import jax
import jax.numpy as jnp
import numpy as np

from learning_to_adapt_tpu.models import core


def test_fused_mlp_matches_reference_interpret():
    from jax.experimental.pallas import tpu as pltpu
    from learning_to_adapt_tpu.ops import fused_mlp

    params = core.init_mlp(jax.random.PRNGKey(0), 26, (64, 64), 20)
    x = jax.random.normal(jax.random.PRNGKey(1), (600, 26), jnp.float32)
    ref = core.mlp_forward(params, x, 'relu', None, jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        out = fused_mlp.fused_mlp_forward(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2,
                               rtol=2e-2)


def test_supported_gate():
    from learning_to_adapt_tpu.ops import fused_mlp
    params = core.init_mlp(jax.random.PRNGKey(0), 26, (64,), 20)
    # CPU backend -> unsupported (falls back to XLA path)
    assert not fused_mlp.supported(params, backend='cpu')
    huge = core.init_mlp(jax.random.PRNGKey(0), 26, (2048, 2048), 20)
    assert not fused_mlp.supported(huge, backend='tpu')


def test_pallas_jacobi_matches_xla_interpret():
    """ops/pallas_jacobi kernel == the engine's XLA fori_loop reference on
    a padded random PSD contact system (interpret mode; the TPU timing
    decision lives in benchmarks/bench_pallas_jacobi.py)."""
    import numpy as np
    import jax.numpy as jnp
    from learning_to_adapt_tpu.ops import pallas_jacobi

    rng = np.random.RandomState(0)
    n = 76  # the cheetah's constraint-row count
    m = rng.randn(n, n).astype(np.float32)
    a = m @ m.T + np.eye(n, dtype=np.float32) * n  # PSD, diagonally heavy
    b = rng.randn(n).astype(np.float32)
    aii_inv = (1.0 / np.diag(a)).astype(np.float32)
    rho = np.max(np.sum(np.abs(a), axis=1) * aii_inv)
    omega = min(1.0, 1.8 / rho)

    ref = pallas_jacobi.jacobi_solve_xla(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(aii_inv), omega, 60)
    out = pallas_jacobi.jacobi_solve(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(aii_inv), omega, 60,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    assert (np.asarray(out) >= 0).all()

