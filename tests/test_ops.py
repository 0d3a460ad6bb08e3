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


def test_planner_forward_dispatch_matches_plain():
    """planner_forward must be numerically identical to mlp_forward whenever
    it falls back (CPU backend here), and the dispatch must never change the
    function signature the models rely on."""
    from learning_to_adapt_tpu.ops import fused_mlp
    params = core.init_mlp(jax.random.PRNGKey(0), 26, (64, 64), 20)
    x = jax.random.normal(jax.random.PRNGKey(1), (4096, 26), jnp.float32)
    ref = core.mlp_forward(params, x, 'relu', None, jnp.bfloat16)
    out = fused_mlp.planner_forward(params, x, 'relu', None, jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # training path (no compute dtype) also routes to the plain forward
    ref32 = core.mlp_forward(params, x, 'relu', None, None)
    out32 = fused_mlp.planner_forward(params, x, 'relu', None, None)
    np.testing.assert_array_equal(np.asarray(out32), np.asarray(ref32))
