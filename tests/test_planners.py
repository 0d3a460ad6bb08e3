"""Planner unit tests with analytically-known optimal actions."""
import jax
import jax.numpy as jnp
import numpy as np

from learning_to_adapt_tpu.policies import planners


def _predict_integrator(obs, act):
    """Perfect model: obs' = obs + act (obs_dim == act_dim)."""
    return obs + act


def _reward_sum(obs, act, next_obs):
    """Reward = increase in coordinate sum: optimum is act = +1."""
    return jnp.sum(next_obs - obs, axis=-1)


class TestRandomShooting:
    def test_picks_best_candidate(self):
        obs = jnp.zeros((3, 2))
        key = jax.random.PRNGKey(0)
        actions, returns = planners.random_shooting(
            _predict_integrator, _reward_sum, obs, key, n_candidates=256,
            horizon=4, act_dim=2)
        # the best of 256 uniform candidates should be strongly positive
        assert actions.shape == (3, 2)
        assert float(actions.mean()) > 0.4
        # returns of chosen candidates beat the mean candidate
        assert float(returns.max(axis=1).mean()) > float(returns.mean())

    def test_discount_prefers_early_reward(self):
        # reward only from the first component; discounting shouldn't break
        # selection
        obs = jnp.zeros((1, 1))
        key = jax.random.PRNGKey(1)
        actions, _ = planners.random_shooting(
            _predict_integrator, _reward_sum, obs, key, n_candidates=128,
            horizon=3, act_dim=1, discount=0.5)
        assert float(actions[0, 0]) > 0.5


class TestCEM:
    def test_converges_to_positive_actions(self):
        obs = jnp.zeros((2, 2))
        key = jax.random.PRNGKey(2)
        actions, _ = planners.cem(
            _predict_integrator, _reward_sum, obs, key, n_candidates=128,
            horizon=3, act_dim=2, num_cem_iters=5, percent_elites=0.1,
            alpha=0.1)
        assert actions.shape == (2, 2)
        # CEM should push the first action towards the +1 bound
        assert float(actions.mean()) > 0.6

    def test_cem_beats_rs_on_narrow_optimum(self):
        # reward peaks sharply at act=0.37: CEM's refinement should land
        # closer than random shooting with the same budget
        target = 0.37

        def reward(obs, act, next_obs):
            return -jnp.sum(jnp.square(act - target), axis=-1)

        obs = jnp.zeros((1, 3))
        key = jax.random.PRNGKey(3)
        a_cem, _ = planners.cem(
            _predict_integrator, reward, obs, key, n_candidates=64,
            horizon=2, act_dim=3, num_cem_iters=6, percent_elites=0.1,
            alpha=0.0)
        a_rs, _ = planners.random_shooting(
            _predict_integrator, reward, obs, key, n_candidates=64,
            horizon=2, act_dim=3)
        err_cem = float(jnp.abs(a_cem - target).mean())
        err_rs = float(jnp.abs(a_rs - target).mean())
        assert err_cem < err_rs


class TestRecurrentPlanners:
    def _predict_h(self, obs, act, hidden):
        # hidden accumulates action history; model = integrator
        new_hidden = jax.tree.map(lambda h: h + jnp.sum(act, axis=-1,
                                                        keepdims=True),
                                  hidden)
        return obs + act, new_hidden

    def test_rs_recurrent_threads_hidden(self):
        obs = jnp.zeros((2, 2))
        hidden = (jnp.zeros((2, 1)),)
        key = jax.random.PRNGKey(4)
        actions, new_hidden = planners.random_shooting_recurrent(
            self._predict_h, _reward_sum, obs, hidden, key, n_candidates=64,
            horizon=3, act_dim=2)
        assert actions.shape == (2, 2)
        # the true hidden advanced by exactly the chosen action's sum
        np.testing.assert_allclose(
            np.asarray(new_hidden[0][:, 0]),
            np.asarray(jnp.sum(actions, axis=-1)), rtol=1e-5)

    def test_cem_recurrent(self):
        obs = jnp.zeros((2, 2))
        hidden = (jnp.zeros((2, 1)),)
        key = jax.random.PRNGKey(5)
        actions, _ = planners.cem_recurrent(
            self._predict_h, _reward_sum, obs, hidden, key, n_candidates=64,
            horizon=2, act_dim=2, num_cem_iters=4)
        assert float(actions.mean()) > 0.5
