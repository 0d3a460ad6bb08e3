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
