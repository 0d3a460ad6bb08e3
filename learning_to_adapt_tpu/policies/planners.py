"""On-device MPC planners: random shooting and CEM.

The reference planner crosses the host<->device boundary `horizon x
num_cem_iters` times per env step (policies/mpc_controller.py:108-129 — the
#1 throughput constraint, SURVEY.md section 3.3). Here the entire planner is
one jitted function: candidate sampling, the horizon rollout under the
learned model (`lax.scan`), reward accumulation and the argmax all stay in
HBM; `vmap` covers candidates x envs, so the model forward is a single
(n_candidates * n_envs)-row batched matmul per horizon step on the MXU.

`predict` is any pure fn (obs(N,d), act(N,a)) -> next_obs — plain, ensemble,
or per-env-adapted (GrBAL) models plug in unchanged. Recurrent variants
thread hidden-state pytrees (ReBAL, reference rnn_mpc_controller.py).
"""
from typing import Callable

import jax
import jax.numpy as jnp


def _repeat_env_major(x, n):
    """(m, ...) -> (m*n, ...) with each env's row repeated n times
    contiguously (np.repeat semantics — the reference's candidate layout)."""
    return jnp.repeat(x, n, axis=0)


def random_shooting(predict: Callable, reward_fn: Callable, obs, key, *,
                    n_candidates, horizon, act_dim, discount=1.0,
                    act_lo=-1.0, act_hi=1.0):
    """obs: (m, obs_dim). Returns (m, act_dim) first actions of the best
    candidate sequences (reference mpc_controller.py:108-129)."""
    m = obs.shape[0]
    n = n_candidates
    a = jax.random.uniform(key, (horizon, n * m, act_dim), obs.dtype,
                           act_lo, act_hi)
    obs0 = _repeat_env_major(obs, n)

    def body(carry, a_t):
        o, ret, t = carry
        nxt = predict(o, a_t)
        r = reward_fn(o, a_t, nxt)
        return (nxt, ret + (discount ** t) * r, t + 1.0), None

    (_, returns, _), _ = jax.lax.scan(
        body, (obs0, jnp.zeros(n * m, obs.dtype), 0.0), a)
    returns = returns.reshape(m, n)
    best = jnp.argmax(returns, axis=1)
    cand_first = a[0].reshape(m, n, act_dim)
    return jnp.take_along_axis(cand_first, best[:, None, None],
                               axis=1)[:, 0], returns


def cem(predict, reward_fn, obs, key, *, n_candidates, horizon, act_dim,
        discount=1.0, num_cem_iters=8, percent_elites=0.1, alpha=0.1,
        act_lo=-1.0, act_hi=1.0, clip_rollout=True):
    """Cross-entropy method over flattened action sequences (reference
    mpc_controller.py:71-106: elites = top percent, mean smoothing alpha).

    clip_rollout: the reference rolls out the UNCLIPPED Gaussian samples
    and returns the unclipped first action — only the elite refit uses the
    clipped copy (`a_stacked = clip(a)` at mpc_controller.py:87, rollout
    and return from `a` at :89,106). `clip_rollout=False` reproduces that;
    the default True evaluates/executes in-bounds actions (a conscious
    improvement, docs/PARITY.md; tests/test_planners.py compares
    clip_rollout=False against a numpy transcription of the reference).
    NB the reference's m>1 CEM also scrambles env/candidate pairing
    (np.repeat env-major obs vs candidate-major action reshape) and fits
    one elite distribution shared across envs — we keep per-env pairing
    either way, i.e. its well-defined m=1 semantics generalized."""
    m = obs.shape[0]
    n = n_candidates
    num_elites = max(int(n_candidates * percent_elites), 1)
    obs0 = _repeat_env_major(obs, n)

    def rollout_returns(a_seq):
        """a_seq: (h, n*m, act_dim) -> returns (n*m,)"""
        def body(carry, a_t):
            o, ret, t = carry
            nxt = predict(o, a_t)
            r = reward_fn(o, a_t, nxt)
            return (nxt, ret + (discount ** t) * r, t + 1.0), None
        (_, returns, _), _ = jax.lax.scan(
            body, (obs0, jnp.zeros(n * m, obs.dtype), 0.0), a_seq)
        return returns

    def iter_body(carry, k):
        mean, std = carry  # (m, h*act_dim)
        z = jax.random.normal(k, (n, m, horizon * act_dim), obs.dtype)
        a_flat = mean + z * std                      # (n, m, h*A)
        a_clip = jnp.clip(a_flat, act_lo, act_hi)
        a_exec = a_clip if clip_rollout else a_flat  # what gets rolled out
        # (n, m, h, A) -> (h, n*m, A) with env-major candidate layout:
        # candidate axis must vary fastest within an env block
        a_seq = a_exec.reshape(n, m, horizon, act_dim)
        a_seq = jnp.transpose(a_seq, (2, 1, 0, 3)).reshape(
            horizon, m * n, act_dim)
        returns = rollout_returns(a_seq).reshape(m, n)
        # elite refit always uses the clipped copy (reference a_stacked)
        _, elite_idx = jax.lax.top_k(returns, num_elites)      # (m, k)
        elites = jnp.take_along_axis(
            jnp.swapaxes(a_clip, 0, 1), elite_idx[:, :, None], axis=1)
        new_mean = mean * alpha + (1 - alpha) * jnp.mean(elites, axis=1)
        new_std = jnp.std(elites, axis=1)
        first = a_seq[0].reshape(m, n, act_dim)
        best = jnp.take_along_axis(first, elite_idx[:, :1, None], axis=1)
        return (new_mean, new_std), best[:, 0]

    mean0 = jnp.zeros((m, horizon * act_dim), obs.dtype)
    std0 = jnp.ones((m, horizon * act_dim), obs.dtype)
    keys = jax.random.split(key, num_cem_iters)
    (_, _), firsts = jax.lax.scan(iter_body, (mean0, std0), keys)
    return firsts[-1], None


def random_shooting_recurrent(predict_h, reward_fn, obs, hidden, key, *,
                              n_candidates, horizon, act_dim, discount=1.0,
                              act_lo=-1.0, act_hi=1.0):
    """ReBAL planner: candidates share the env's current hidden state, which
    is fanned out over candidates, and the *real* hidden state advances by
    one predict with the chosen action (reference
    rnn_mpc_controller.py:63,165-187).

    predict_h(obs, act, hidden) -> (next_obs, next_hidden)
    hidden: pytree with leading batch axis m.
    Returns (actions (m, act_dim), new_hidden)."""
    m = obs.shape[0]
    n = n_candidates
    a = jax.random.uniform(key, (horizon, n * m, act_dim), obs.dtype,
                           act_lo, act_hi)
    obs0 = _repeat_env_major(obs, n)
    hidden0 = jax.tree.map(lambda h: _repeat_env_major(h, n), hidden)

    def body(carry, a_t):
        o, h, ret, t = carry
        nxt, h2 = predict_h(o, a_t, h)
        r = reward_fn(o, a_t, nxt)
        return (nxt, h2, ret + (discount ** t) * r, t + 1.0), None

    (_, _, returns, _), _ = jax.lax.scan(
        body, (obs0, hidden0, jnp.zeros(n * m, obs.dtype), 0.0), a)
    returns = returns.reshape(m, n)
    best = jnp.argmax(returns, axis=1)
    cand_first = a[0].reshape(m, n, act_dim)
    actions = jnp.take_along_axis(cand_first, best[:, None, None],
                                  axis=1)[:, 0]
    _, new_hidden = predict_h(obs, actions, hidden)
    return actions, new_hidden


def cem_recurrent(predict_h, reward_fn, obs, hidden, key, *, n_candidates,
                  horizon, act_dim, discount=1.0, num_cem_iters=8,
                  percent_elites=0.05, act_lo=-1.0, act_hi=1.0):
    """CEM with hidden-state threading; no mean smoothing (the reference
    recurrent CEM has no alpha, rnn_mpc_controller.py:107)."""
    m = obs.shape[0]
    n = n_candidates
    num_elites = max(int(n_candidates * percent_elites), 1)
    obs0 = _repeat_env_major(obs, n)
    hidden0 = jax.tree.map(lambda h: _repeat_env_major(h, n), hidden)

    def rollout_returns(a_seq):
        def body(carry, a_t):
            o, h, ret, t = carry
            nxt, h2 = predict_h(o, a_t, h)
            r = reward_fn(o, a_t, nxt)
            return (nxt, h2, ret + (discount ** t) * r, t + 1.0), None
        (_, _, returns, _), _ = jax.lax.scan(
            body, (obs0, hidden0, jnp.zeros(n * m, obs.dtype), 0.0), a_seq)
        return returns

    def iter_body(carry, k):
        mean, std = carry
        z = jax.random.normal(k, (n, m, horizon * act_dim), obs.dtype)
        a_clip = jnp.clip(mean + z * std, act_lo, act_hi)
        a_seq = a_clip.reshape(n, m, horizon, act_dim)
        a_seq = jnp.transpose(a_seq, (2, 1, 0, 3)).reshape(
            horizon, m * n, act_dim)
        returns = rollout_returns(a_seq).reshape(m, n)
        _, elite_idx = jax.lax.top_k(returns, num_elites)
        elites = jnp.take_along_axis(
            jnp.swapaxes(a_clip, 0, 1), elite_idx[:, :, None], axis=1)
        new_mean = jnp.mean(elites, axis=1)
        new_std = jnp.std(elites, axis=1)
        first = a_seq[0].reshape(m, n, act_dim)
        best = jnp.take_along_axis(first, elite_idx[:, :1, None], axis=1)
        return (new_mean, new_std), best[:, 0]

    mean0 = jnp.zeros((m, horizon * act_dim), obs.dtype)
    std0 = jnp.ones((m, horizon * act_dim), obs.dtype)
    keys = jax.random.split(key, num_cem_iters)
    (_, _), firsts = jax.lax.scan(iter_body, (mean0, std0), keys)
    actions = firsts[-1]
    _, new_hidden = predict_h(obs, actions, hidden)
    return actions, new_hidden
