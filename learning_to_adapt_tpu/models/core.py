"""Shared building blocks for learned dynamics models.

Replaces the reference's TF1 graph builders (dynamics/core/layers.py,
dynamics/core/utils.py: create_mlp/forward_mlp/create_rnn). Parameters are
plain pytrees; the MAML-critical "forward with externally supplied params"
trick (reference core/utils.py:241-296) is native in JAX — adapted parameters
are just another pytree.
"""
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

_ACTIVATIONS = {
    None: lambda x: x,
    'relu': jax.nn.relu,
    'tanh': jnp.tanh,
    'sigmoid': jax.nn.sigmoid,
    'swish': jax.nn.swish,
}


def activation(name):
    if callable(name):
        return name
    return _ACTIVATIONS[name]


def init_mlp(key, in_dim: int, hidden_sizes: Sequence[int], out_dim: int,
             dtype=jnp.float32):
    """Xavier-uniform weights, zero biases (matching the reference's init,
    core/utils.py:81-82). Returns {'w': [..], 'b': [..]} pytree."""
    sizes = [in_dim] + list(hidden_sizes) + [out_dim]
    ws, bs = [], []
    for i in range(len(sizes) - 1):
        key, sub = jax.random.split(key)
        fan_in, fan_out = sizes[i], sizes[i + 1]
        limit = np.sqrt(6.0 / (fan_in + fan_out))
        ws.append(jax.random.uniform(sub, (fan_in, fan_out), dtype,
                                     -limit, limit))
        bs.append(jnp.zeros((fan_out,), dtype))
    return {'w': ws, 'b': bs}


def mlp_forward(params, x, hidden_nonlinearity='relu',
                output_nonlinearity=None, compute_dtype=None):
    """Feed-forward pass. With compute_dtype=bfloat16 the matmuls run on the
    MXU at 2x throughput (f32 accumulation via preferred_element_type; params
    stay f32 — used for the planner's huge candidate batches where bf16
    model predictions are well within the learned model's own error)."""
    act = activation(hidden_nonlinearity)
    out_act = activation(output_nonlinearity)
    n = len(params['w'])
    out_dtype = x.dtype
    for i, (w, b) in enumerate(zip(params['w'], params['b'])):
        if compute_dtype is not None:
            x = jnp.dot(x.astype(compute_dtype), w.astype(compute_dtype),
                        preferred_element_type=out_dtype) + b
        else:
            x = x @ w + b
        x = act(x) if i < n - 1 else out_act(x)
    return x


# ---------------------------------------------------------------------------
# recurrent cells (ReBAL)
# ---------------------------------------------------------------------------

def init_lstm(key, in_dim, hidden, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    limit = np.sqrt(6.0 / (in_dim + hidden + 4 * hidden))
    return {
        'wi': jax.random.uniform(k1, (in_dim, 4 * hidden), dtype, -limit,
                                 limit),
        'wh': jax.random.uniform(k2, (hidden, 4 * hidden), dtype, -limit,
                                 limit),
        'b': jnp.zeros((4 * hidden,), dtype),
    }


def lstm_step(params, carry, x):
    h, c = carry
    gates = x @ params['wi'] + h @ params['wh'] + params['b']
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    # forget-gate bias 1.0 (TF BasicLSTMCell default the reference relies on)
    c = jax.nn.sigmoid(f + 1.0) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return (h, c), h


def init_gru(key, in_dim, hidden, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    limit = np.sqrt(6.0 / (in_dim + hidden + 3 * hidden))
    return {
        'wi': jax.random.uniform(k1, (in_dim, 3 * hidden), dtype, -limit,
                                 limit),
        'wh': jax.random.uniform(k2, (hidden, 3 * hidden), dtype, -limit,
                                 limit),
        'b': jnp.zeros((3 * hidden,), dtype),
    }


def gru_step(params, carry, x):
    h = carry
    xi = x @ params['wi'] + params['b']
    hh = h @ params['wh']
    xr, xz, xn = jnp.split(xi, 3, axis=-1)
    hr, hz, hn = jnp.split(hh, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    h = (1 - z) * n + z * h
    return h, h


def init_rnn(key, in_dim, hidden, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    limit = np.sqrt(6.0 / (in_dim + 2 * hidden))
    return {
        'wi': jax.random.uniform(k1, (in_dim, hidden), dtype, -limit, limit),
        'wh': jax.random.uniform(k2, (hidden, hidden), dtype, -limit, limit),
        'b': jnp.zeros((hidden,), dtype),
    }


def rnn_step(params, carry, x):
    h = jnp.tanh(x @ params['wi'] + carry @ params['wh'] + params['b'])
    return h, h


CELLS = {
    'lstm': (init_lstm, lstm_step,
             lambda bs, h, dt: (jnp.zeros((bs, h), dt), jnp.zeros((bs, h),
                                                                  dt))),
    'gru': (init_gru, gru_step, lambda bs, h, dt: jnp.zeros((bs, h), dt)),
    'rnn': (init_rnn, rnn_step, lambda bs, h, dt: jnp.zeros((bs, h), dt)),
}
