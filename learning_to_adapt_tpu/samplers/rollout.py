"""Fused on-device rollout engine.

The reference's sampling iteration is a host while-loop crossing the
host<->device boundary per step for adaptation, planning (horizon x
sess.run), and physics (C library via worker pipes) — SURVEY.md sections
3.2-3.3. Here an entire sampling iteration is a handful of dispatches of ONE
jitted program:

    lax.scan over a time segment of
      [per-step fast adaptation (GrBAL) / hidden threading (ReBAL)]
      -> on-device MPC planner (vmap over candidates x envs)
      -> batched physics step (vmap over envs)

The time axis is chunked into identical segments (default <= 125 steps): the
segment program compiles once and is dispatched max_path_length/segment
times with the carry (env states, adaptation history, RNN hidden, PRNG key)
threaded through on device — compile cost is bounded regardless of path
length, and the few extra dispatches per iteration are noise next to the
on-device work.

Each call collects num_rollouts complete paths (the reference's
total_samples = num_rollouts * max_path_length with one path per env,
sampler/sampler.py:44-139); tasks resample per call via the env reset
(reset_every_episode).
"""
import jax
import jax.numpy as jnp

from learning_to_adapt_tpu.models.meta_mlp import MetaMLPDynamicsModel
from learning_to_adapt_tpu.models.rnn import RNNDynamicsModel


def _segment_len(t_len, target=125):
    """Largest divisor of t_len that is <= target (so a path is an integer
    number of identical compiled segments)."""
    best = 1
    for d in range(1, min(target, t_len) + 1):
        if t_len % d == 0:
            best = d
    return best


def make_rollout_fn(env, policy, dynamics_model, num_rollouts,
                    max_path_length, adapt_batch_size=None, random=False,
                    segment_len=None, mesh=None, ablate_hidden=None,
                    ablate_warmup=16):
    """Builds the rollout program.

    env: NormalizedEnv; policy: MPCController/RNNMPCController.
    Returns fn(params, normalizer, key, episode_idx) -> paths dict of
    stacked arrays [num_rollouts, T, ...].

    With `mesh`, the env axis is sharded over mesh axis 'env' (a sharding
    constraint on the reset states that GSPMD propagates through the whole
    segment program — collectives only where physics/planner reductions
    need them, i.e. nowhere).

    ablate_hidden (recurrent models only) isolates ReBAL's adaptation
    mechanism — the hidden-state update by each real transition (reference
    rnn_mpc_controller.py:63) — for within-model ablations, the recurrent
    analog of GrBAL's adapted/pre-update split:
      'zero'    the model plans from the initial (zero) hidden state every
                step: recurrent adaptation removed entirely
      'frozen'  the hidden state advances normally for `ablate_warmup`
                steps (matched to GrBAL's adapt_batch_size window), then
                stays frozen for the rest of the path
    """
    m = num_rollouts
    t_len = max_path_length
    seg = segment_len or _segment_len(t_len)
    n_segments = t_len // seg
    assert seg * n_segments == t_len
    base_env = env.wrapped_env if hasattr(env, 'wrapped_env') else env
    obs_dim = base_env.obs_dim
    act_dim = base_env.act_dim
    is_meta = isinstance(dynamics_model, MetaMLPDynamicsModel)
    is_rnn = isinstance(dynamics_model, RNNDynamicsModel)
    a_bs = adapt_batch_size
    assert ablate_hidden in (None, 'zero', 'frozen')
    assert not (ablate_hidden and not is_rnn), \
        'ablate_hidden applies to recurrent models only'

    def init_carry(key, episode_idx):
        k_reset, k_run = jax.random.split(key)
        reset_keys = jax.random.split(k_reset, m)
        states = jax.vmap(lambda k: env.reset(k, episode_idx))(reset_keys)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            states = jax.lax.with_sharding_constraint(
                states, NamedSharding(mesh, P('env')))
        hist = None
        if a_bs:
            hist_obs = (jnp.zeros((m, a_bs + 1, obs_dim), states.obs.dtype)
                        .at[:, -1].set(states.obs))
            hist_act = jnp.zeros((m, a_bs, act_dim), states.obs.dtype)
            hist = (hist_obs, hist_act)
        hidden0 = (dynamics_model.get_initial_hidden(m) if is_rnn else None)
        return (states, hist, hidden0, k_run)

    def plan_actions(params, norm, carry_obs, hist, hidden, t, k):
        if random:
            return jax.random.uniform(
                k, (m, act_dim), carry_obs.dtype, -1.0, 1.0), hidden

        if is_rnn:
            def predict_h(o, a, h):
                return dynamics_model.predict_fn(params, norm, o, a, h)
            h_in = (dynamics_model.get_initial_hidden(m)
                    if ablate_hidden == 'zero' else hidden)
            actions, h_new = policy.plan_fn_recurrent(
                predict_h, carry_obs, h_in, k)
            if ablate_hidden == 'zero':
                h_new = hidden  # carry untouched (never read again)
            elif ablate_hidden == 'frozen':
                h_new = jax.tree.map(
                    lambda n_, o_: jnp.where(t < ablate_warmup, n_, o_),
                    h_new, hidden)
            return actions, h_new

        if is_meta and a_bs is not None:
            h_obs, h_act = hist
            # per-env fast adaptation on the trailing window: the last
            # a_bs transitions are (h_obs[:-1], h_act, h_obs[1:])
            adapted = dynamics_model.adapt_fn(
                params, norm, h_obs[:, :-1], h_act, h_obs[:, 1:])
            use_adapted = t > (a_bs + 1)
            merged = jax.tree.map(
                lambda a, p: jnp.where(use_adapted, a,
                                       jnp.broadcast_to(p, a.shape)),
                adapted, params)

            def predict(o_rows, a_rows):
                per = o_rows.shape[0] // m
                out = dynamics_model.predict_adapted_fn(
                    merged, norm, o_rows.reshape(m, per, -1),
                    a_rows.reshape(m, per, -1))
                return out.reshape(o_rows.shape[0], -1)
        else:
            def predict(o_rows, a_rows):
                return dynamics_model.predict_fn(params, norm, o_rows,
                                                 a_rows)
        return policy.plan_fn(predict, carry_obs, k), hidden

    def segment(params, norm, carry, t0):
        """One compiled segment: `seg` steps starting at global step t0."""

        def step_fn(carry, t):
            states, hist, hidden, key = carry
            key, k_plan = jax.random.split(key)
            obs_before = states.obs
            actions, hidden = plan_actions(params, norm, obs_before, hist,
                                           hidden, t, k_plan)
            states, obs_after, rewards, dones, _ = jax.vmap(env.step)(
                states, actions)
            if a_bs:
                h_obs, h_act = hist
                h_obs = jnp.concatenate(
                    [h_obs[:, 1:], obs_after[:, None]], axis=1)
                h_act = jnp.concatenate(
                    [h_act[:, 1:], actions[:, None]], axis=1)
                hist = (h_obs, h_act)
            out = dict(observations=obs_before, actions=actions,
                       rewards=rewards, dones=dones,
                       next_observations=obs_after,
                       qpos=states.phys.qpos, qvel=states.phys.qvel)
            return (states, hist, hidden, key), out

        carry, outs = jax.lax.scan(step_fn, carry, t0 + jnp.arange(seg))
        outs = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), outs)
        return carry, outs

    init_jit = jax.jit(init_carry)
    segment_jit = jax.jit(segment)

    def rollout(params, norm, key, episode_idx):
        carry = init_jit(key, jnp.asarray(episode_idx, jnp.int32))
        chunks = []
        for s in range(n_segments):
            carry, outs = segment_jit(params, norm, carry,
                                      jnp.asarray(s * seg, jnp.int32))
            chunks.append(outs)
        if n_segments == 1:
            return chunks[0]
        return jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=1), *chunks)

    # exposed for tests/profiling (e.g. the zero-collective HLO assertion
    # in tests/test_infra.py — the structural basis of linear env-axis
    # scaling)
    rollout.init_jit = init_jit
    rollout.segment_jit = segment_jit
    return rollout
