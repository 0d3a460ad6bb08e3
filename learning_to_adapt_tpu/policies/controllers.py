"""MPC controller objects (host-facing API parity with the reference
policies/mpc_controller.py and rnn_mpc_controller.py).

These hold static planner config and the dynamics model reference. The hot
path is the pure planner functions in planners.py — the fused sampler calls
those directly; the class methods here wrap them for host-driven use
(replay/sim_policy) with numpy I/O.
"""
import jax
import jax.numpy as jnp
import numpy as np

from learning_to_adapt_tpu.policies import planners


class MPCController:
    def __init__(self, name, env, dynamics_model, reward_model=None,
                 discount=1.0, use_cem=False, n_candidates=1024, horizon=10,
                 num_cem_iters=8, percent_elites=0.1, use_reward_model=False,
                 alpha=0.1, seed=0):
        self.name = name
        self.env = env
        self.dynamics_model = dynamics_model
        self.discount = discount
        self.use_cem = use_cem
        self.n_candidates = n_candidates
        self.horizon = horizon
        self.num_cem_iters = num_cem_iters
        self.percent_elites = percent_elites
        self.alpha = alpha
        self._key = jax.random.PRNGKey(seed)

        self.unwrapped_env = env
        while hasattr(self.unwrapped_env, 'wrapped_env'):
            self.unwrapped_env = self.unwrapped_env.wrapped_env
        assert hasattr(self.unwrapped_env, 'reward'), \
            'env must have a reward function'
        self.act_dim = self.unwrapped_env.act_dim

    @property
    def vectorized(self):
        return True

    @property
    def recurrent(self):
        return False

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def plan_fn(self, predict, obs, key):
        """Pure planner entry used by the fused sampler: predict is a
        (obs_rows, act_rows) -> next_obs_rows closure."""
        if self.use_cem:
            actions, _ = planners.cem(
                predict, self.unwrapped_env.reward, obs, key,
                n_candidates=self.n_candidates, horizon=self.horizon,
                act_dim=self.act_dim, discount=self.discount,
                num_cem_iters=self.num_cem_iters,
                percent_elites=self.percent_elites, alpha=self.alpha)
        else:
            actions, _ = planners.random_shooting(
                predict, self.unwrapped_env.reward, obs, key,
                n_candidates=self.n_candidates, horizon=self.horizon,
                act_dim=self.act_dim, discount=self.discount)
        return actions

    # ---- host API (replay tooling) --------------------------------------
    def get_action(self, observation):
        observation = np.atleast_2d(observation)
        actions, info = self.get_actions(observation)
        return actions[0], info

    def get_actions(self, observations):
        model = self.dynamics_model
        obs = jnp.asarray(observations)
        if getattr(model, 'adapted', False):
            n_env = jax.tree.leaves(model._adapted_params)[0].shape[0]

            def predict(o_rows, a_rows):
                per = o_rows.shape[0] // n_env
                out = model.predict_adapted_fn(
                    model._adapted_params, model.normalizer,
                    o_rows.reshape(n_env, per, -1),
                    a_rows.reshape(n_env, per, -1))
                return out.reshape(o_rows.shape[0], -1)
        else:
            def predict(o_rows, a_rows):
                return model.predict_fn(model.params, model.normalizer,
                                        o_rows, a_rows)
        actions = self.plan_fn(predict, obs, self._next_key())
        return np.asarray(actions), {}

    def get_random_action(self, n):
        key = self._next_key()
        return np.asarray(jax.random.uniform(
            key, (n, self.act_dim), minval=-1.0, maxval=1.0))

    def reset(self, dones=None):
        pass


class RNNMPCController(MPCController):
    """Recurrent-model MPC: threads and fans out hidden state over
    candidates; reset(dones) zeroes hidden state per done env (reference
    rnn_mpc_controller.py:139-163)."""

    def __init__(self, name, env, dynamics_model, discount=1.0, use_cem=False,
                 n_candidates=1024, horizon=10, num_cem_iters=8,
                 percent_elites=0.05, alpha=0.1, num_rollouts=1, seed=0):
        super().__init__(name, env, dynamics_model, discount=discount,
                         use_cem=use_cem, n_candidates=n_candidates,
                         horizon=horizon, num_cem_iters=num_cem_iters,
                         percent_elites=percent_elites, alpha=alpha,
                         seed=seed)
        self.num_rollouts = num_rollouts
        self._hidden = None

    @property
    def recurrent(self):
        return True

    def plan_fn_recurrent(self, predict_h, obs, hidden, key):
        if self.use_cem:
            return planners.cem_recurrent(
                predict_h, self.unwrapped_env.reward, obs, hidden, key,
                n_candidates=self.n_candidates, horizon=self.horizon,
                act_dim=self.act_dim, discount=self.discount,
                num_cem_iters=self.num_cem_iters,
                percent_elites=self.percent_elites)
        return planners.random_shooting_recurrent(
            predict_h, self.unwrapped_env.reward, obs, hidden, key,
            n_candidates=self.n_candidates, horizon=self.horizon,
            act_dim=self.act_dim, discount=self.discount)

    def get_actions(self, observations):
        model = self.dynamics_model
        obs = jnp.asarray(observations)
        if self._hidden is None:
            self._hidden = model.get_initial_hidden(obs.shape[0])

        def predict_h(o, a, h):
            return model.predict_fn(model.params, model.normalizer, o, a, h)

        actions, self._hidden = self.plan_fn_recurrent(
            predict_h, obs, self._hidden, self._next_key())
        return np.asarray(actions), {}

    def reset(self, dones=None):
        model = self.dynamics_model
        if dones is None:
            self._hidden = None
            return
        n = len(dones)
        if self._hidden is None:
            self._hidden = model.get_initial_hidden(n)
            return
        zeros = model.get_initial_hidden(n)
        mask = jnp.asarray(np.asarray(dones, bool))
        self._hidden = jax.tree.map(
            lambda h, z: jnp.where(mask[:, None], z, h), self._hidden, zeros)
