"""Input/output normalization statistics for dynamics models.

Matches the reference semantics: per-dimension mean/std over (obs, act,
delta) recomputed from each iteration's fresh data (reference
mlp_dynamics.py:253-262), epsilon 1e-10 in both directions
(mlp_dynamics.py:268-274). One conscious fix: the reference stores data
normalized with the stats current at insertion time, so old rows keep stale
stats; here raw data is stored and normalized on the fly with the latest
stats.
"""
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

EPS = 1e-10


@jax.tree_util.register_dataclass
@dataclass
class Normalizer:
    obs_mean: Any
    obs_std: Any
    act_mean: Any
    act_std: Any
    delta_mean: Any
    delta_std: Any

    @staticmethod
    def init(obs_dim, act_dim, dtype=jnp.float32):
        z, o = jnp.zeros, jnp.ones
        return Normalizer(z(obs_dim, dtype), o(obs_dim, dtype),
                          z(act_dim, dtype), o(act_dim, dtype),
                          z(obs_dim, dtype), o(obs_dim, dtype))

    @staticmethod
    def fit(obs, act, delta, weights=None):
        """Compute stats over leading axes; optional per-row weights mask
        (for padded ring buffers)."""
        def stats(x):
            if weights is None:
                m = jnp.mean(x, axis=tuple(range(x.ndim - 1)))
                s = jnp.std(x, axis=tuple(range(x.ndim - 1)))
            else:
                w = weights / jnp.maximum(weights.sum(), 1.0)
                wx = w.reshape(w.shape + (1,) * (x.ndim - w.ndim))
                m = jnp.sum(wx * x, axis=tuple(range(x.ndim - 1)))
                var = jnp.sum(wx * jnp.square(x - m),
                              axis=tuple(range(x.ndim - 1)))
                s = jnp.sqrt(jnp.maximum(var, 0.0))
            return m, s
        om, os_ = stats(obs)
        am, as_ = stats(act)
        dm, ds = stats(delta)
        return Normalizer(om, os_, am, as_, dm, ds)

    def norm_obs(self, obs):
        return (obs - self.obs_mean) / (self.obs_std + EPS)

    def norm_act(self, act):
        return (act - self.act_mean) / (self.act_std + EPS)

    def norm_delta(self, delta):
        return (delta - self.delta_mean) / (self.delta_std + EPS)

    def denorm_delta(self, delta_n):
        return delta_n * (self.delta_std + EPS) + self.delta_mean
