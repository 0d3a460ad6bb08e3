"""Pallas TPU kernel: fused multi-layer MLP forward.

The planner's inner loop is `horizon` passes of a (n_candidates *
n_envs)-row MLP (policies/planners.py). Under XLA each layer's activation
(e.g. 131072 x 512 f32 = 256 MB at bench sizes) round-trips HBM between
matmuls; this kernel tiles the row dimension and keeps every inter-layer
activation in VMEM, so each tile streams through all layers back-to-back on
the MXU — HBM traffic drops from (L+1) activations to exactly one read of x
and one write of y (weights stay VMEM-resident across the whole grid).

STATUS: benchmark-only. Honest device-serialized timing (benchmarks/
bench_pallas_shapes.py, differenced scan lengths to cancel the ~20 ms
host-dispatch RTT of the tunneled backend) measured XLA at 137-144 TFLOP/s
vs this kernel's 74-88 on the canonical and saturated planner shapes on
TPU v5e — XLA already fuses bias+nonlinearity into the matmul epilogue and
pipelines HBM weight streaming better than this VMEM-resident scheme. The
planner path therefore calls core.mlp_forward directly with no dispatch
gate (round-3 VERDICT #8); this kernel remains as validated infrastructure
(tests/test_ops.py) and a baseline for future re-tuning. The same verdict
holds for the latency-chain attempt ops/pallas_jacobi.py (0.64x XLA on the
contact-solver sweep chain, benchmarks/bench_pallas_jacobi.py).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# row tile: multiple of the f32 sublane (8); 2048 rows x 512 features f32
# = 4 MB activation per tile (weights are bf16 and VMEM-resident)
_TILE_ROWS = 2048
_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom below the ~16 MB/core VMEM

def _kernel(n_layers, hidden_nonlinearity, x_ref, *refs):
    """refs = w_0, b_0, ..., w_{L-1}, b_{L-1}, out_ref."""
    out_ref = refs[-1]
    h = x_ref[:]
    for i in range(n_layers):
        w = refs[2 * i][:]        # bf16, pre-cast by the caller
        b = refs[2 * i + 1][:]
        h = jnp.dot(h.astype(jnp.bfloat16), w,
                    preferred_element_type=jnp.float32) + b
        if i < n_layers - 1:
            if hidden_nonlinearity == 'relu':
                h = jnp.maximum(h, 0.0)
            elif hidden_nonlinearity == 'tanh':
                h = jnp.tanh(h)
            elif hidden_nonlinearity == 'swish':
                h = h * jax.nn.sigmoid(h)
            elif hidden_nonlinearity == 'sigmoid':
                h = jax.nn.sigmoid(h)
    # kernel accumulates f32; cast back for non-f32 callers (bf16 x)
    out_ref[:] = h.astype(out_ref.dtype)


def _weights_fit_vmem(params):
    # weights are cast to bf16 by the caller (2 B); biases stay f32
    bytes_w = sum(int(np.prod(w.shape)) * 2 + int(np.prod(b.shape)) * 4
                  for w, b in zip(params['w'], params['b']))
    # resident activations per grid step: the x tile, the out tile, and
    # (conservatively double-buffered) the widest inter-layer activation
    in_dim = int(params['w'][0].shape[0])
    out_dim = int(params['w'][-1].shape[1])
    max_feat = max(int(w.shape[1]) for w in params['w'])
    act = _TILE_ROWS * (in_dim + out_dim + 2 * max_feat) * 4
    return bytes_w + act < _VMEM_BUDGET


def supported(params, backend=None):
    backend = backend or jax.default_backend()
    if backend != 'tpu':
        return False
    return _weights_fit_vmem(params)


@functools.partial(jax.jit, static_argnames=('hidden_nonlinearity',))
def fused_mlp_forward(params, x, hidden_nonlinearity='relu'):
    """x: (N, in_dim) f32. Returns (N, out_dim) f32. Pads N up to the row
    tile internally. Output nonlinearity is identity (the dynamics models
    use output_nonlinearity=None)."""
    n = x.shape[0]
    n_layers = len(params['w'])
    out_dim = params['w'][-1].shape[1]
    n_pad = ((n + _TILE_ROWS - 1) // _TILE_ROWS) * _TILE_ROWS
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    grid = (n_pad // _TILE_ROWS,)

    in_specs = [pl.BlockSpec((_TILE_ROWS, x.shape[1]),
                             lambda i: (i, 0), memory_space=pltpu.VMEM)]
    args = [x]
    for w, b in zip(params['w'], params['b']):
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((1, b.shape[0]), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(w.astype(jnp.bfloat16))
        args.append(b.reshape(1, -1))

    out = pl.pallas_call(
        functools.partial(_kernel, n_layers, hidden_nonlinearity),
        out_shape=jax.ShapeDtypeStruct((n_pad, out_dim), x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((_TILE_ROWS, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(*args)
    return out[:n]
