"""Meta-learned (MAML) dynamics model for GrBAL.

Capability parity with the reference MetaMLPDynamicsModel
(dynamics/meta_mlp_dynamics.py). Where the reference builds three TF graphs
(pre-update, meta-training with per-task clones and a symbolic SGD step, and
placeholder-fed post-update inference, meta_mlp_dynamics.py:68-163), here the
whole algorithm is three pure functions:

  inner_step(theta, window)      theta' = theta - alpha * grad mse   (adapt)
  meta_loss(theta, pre, post)    mean_task mse(inner_step(theta, pre), post)
                                 — second-order gradients for free
  predict(theta_or_adapted, ...) adapted params are a pytree with a leading
                                 env axis; no placeholder plumbing

Training batches are contiguous windows of 2*batch_size steps at random
(path, offset) positions, pre/post = time-adjacent halves — matching the
"adapt on recent past, predict near future" regime (reference
meta_mlp_dynamics.py:99-100, 353-383).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from learning_to_adapt_tpu.models import core
from learning_to_adapt_tpu.models.normalizer import Normalizer

PATH_CHUNK = 64  # dataset capacity grows in path-count chunks (jit stability)


def _bucket_pow2(n):
    """Round a step/batch count to the nearest power of two (>=1) so the
    jitted epoch program recompiles O(log) times as the dataset grows,
    instead of every iteration."""
    if n <= 1:
        return 1
    return int(2 ** round(np.log2(n)))


class MetaMLPDynamicsModel:
    def __init__(self, name, env, hidden_sizes=(512, 512), meta_batch_size=10,
                 hidden_nonlinearity='relu', output_nonlinearity=None,
                 batch_size=500, learning_rate=0.001, inner_learning_rate=0.1,
                 normalize_input=True, valid_split_ratio=0.2,
                 rolling_average_persitency=0.99, seed=0,
                 dtype=jnp.float32, planner_compute_dtype=jnp.bfloat16):
        self.name = name
        self.obs_dim = env.obs_dim
        self.act_dim = env.act_dim
        self.hidden_sizes = tuple(hidden_sizes)
        self.hidden_nonlinearity = hidden_nonlinearity
        self.output_nonlinearity = output_nonlinearity
        self.meta_batch_size = meta_batch_size
        self.batch_size = batch_size
        self.learning_rate = learning_rate
        self.inner_learning_rate = inner_learning_rate
        self.normalize_input = normalize_input
        self.valid_split_ratio = valid_split_ratio
        self.rolling_average_persitency = rolling_average_persitency
        self.dtype = dtype
        self.planner_compute_dtype = planner_compute_dtype

        key = jax.random.PRNGKey(seed)
        self.params = core.init_mlp(key, self.obs_dim + self.act_dim,
                                    self.hidden_sizes, self.obs_dim, dtype)
        # global-norm clipping protects the fit loop from occasional
        # outlier transitions (crash states); the reference's plain Adam
        # diverges irrecoverably on such data
        self.optimizer = optax.chain(optax.clip_by_global_norm(100.0),
                                     optax.adam(learning_rate))
        self.opt_state = self.optimizer.init(self.params)
        self.normalizer = Normalizer.init(self.obs_dim, self.act_dim, dtype)

        self._train = None  # dict of numpy [P, T, d]
        self._test = None
        self._rng = np.random.RandomState(seed + 1)
        self._epoch_cache = {}
        self._adapted_params = None  # pytree with leading env axis, or None

    # ----------------------------------------------------------- core math
    def _forward(self, params, x):
        return core.mlp_forward(params, x, self.hidden_nonlinearity,
                                self.output_nonlinearity)

    def _mse(self, params, obs_n, act_n, delta_n):
        x = jnp.concatenate([obs_n, act_n], axis=-1)
        return jnp.mean(jnp.square(self._forward(params, x) - delta_n))

    def inner_step_fn(self, params, obs_n, act_n, delta_n):
        """One gradient-descent step at the inner learning rate (the MAML
        fast-adaptation update, reference meta_mlp_dynamics.py:409-421)."""
        g = jax.grad(self._mse)(params, obs_n, act_n, delta_n)
        return jax.tree.map(
            lambda p, gi: p - self.inner_learning_rate * gi, params, g)

    def meta_loss_fn(self, params, norm, obs, act, delta):
        """obs/act/delta: (meta_bs, 2*bs, d) raw. Returns (post_loss,
        pre_loss) with the inner step differentiated through (2nd order)."""
        obs_n = norm.norm_obs(obs)
        act_n = norm.norm_act(act)
        delta_n = norm.norm_delta(delta)
        bs = self.batch_size

        def per_task(o, a, d):
            adapted = self.inner_step_fn(params, o[:bs], a[:bs], d[:bs])
            pre = self._mse(params, o[:bs], a[:bs], d[:bs])
            post = self._mse(adapted, o[bs:], a[bs:], d[bs:])
            return post, pre

        post, pre = jax.vmap(per_task)(obs_n, act_n, delta_n)
        return jnp.mean(post), jnp.mean(pre)

    # ------------------------------------------------------------------ fit
    def fit(self, obs, act, obs_next, epochs=1000, compute_normalization=True,
            valid_split_ratio=None, rolling_average_persitency=None,
            verbose=False, log_tabular=False, logger=None):
        assert obs.ndim == 3 and obs.shape[2] == self.obs_dim
        assert act.ndim == 3 and act.shape[2] == self.act_dim
        obs = np.asarray(obs, np.float32)
        act = np.asarray(act, np.float32)
        delta = np.asarray(obs_next, np.float32) - obs
        if valid_split_ratio is None:
            valid_split_ratio = self.valid_split_ratio
        if rolling_average_persitency is None:
            rolling_average_persitency = self.rolling_average_persitency

        if self.normalize_input and (compute_normalization or
                                     self._train is None):
            self.normalizer = Normalizer.fit(
                jnp.asarray(obs), jnp.asarray(act), jnp.asarray(delta))

        # split along the path axis, aggregate across iterations
        n_paths = obs.shape[0]
        idx = self._rng.permutation(n_paths)
        split = max(int(n_paths * (1 - valid_split_ratio)), 1)
        tr, te = idx[:split], idx[split:] if split < n_paths else idx[-1:]
        new_tr = dict(obs=obs[tr], act=act[tr], delta=delta[tr])
        new_te = dict(obs=obs[te], act=act[te], delta=delta[te])
        if self._train is None:
            self._train, self._test = new_tr, new_te
        else:
            self._train = {k: np.concatenate([self._train[k], new_tr[k]])
                           for k in new_tr}
            self._test = {k: np.concatenate([self._test[k], new_te[k]])
                          for k in new_te}

        p_tr = self._train['obs'].shape[0]
        p_te = self._test['obs'].shape[0]
        t_len = self._train['obs'].shape[1]
        cap_tr = int(np.ceil(p_tr / PATH_CHUNK)) * PATH_CHUNK
        cap_te = int(np.ceil(p_te / PATH_CHUNK)) * PATH_CHUNK

        def pad_paths(d, cap, count):
            out = []
            for k in ('obs', 'act', 'delta'):
                a = d[k]
                p = np.zeros((cap,) + a.shape[1:], a.dtype)
                p[:count] = a
                out.append(p)
            return out

        from learning_to_adapt_tpu.parallel.mesh import (
            stage_fit_data, stage_model_state)
        # explicit learner-state restage (replaces params/opt_state/
        # normalizer with mesh-replicated copies when self.mesh is set)
        stage_model_state(self)
        tr_dev, te_dev = stage_fit_data(
            self, tuple(pad_paths(self._train, cap_tr, p_tr)),
            tuple(pad_paths(self._test, cap_te, p_te)))

        steps_per_epoch = _bucket_pow2(max(int(
            p_tr * t_len / (self.meta_batch_size * self.batch_size * 2)), 1))
        steps_test = _bucket_pow2(max(int(
            p_te * t_len / (self.meta_batch_size * self.batch_size * 2)), 1))
        epoch_fn = self._get_epoch_fn(cap_tr, cap_te, t_len, steps_per_epoch,
                                      steps_test)

        key = jax.random.PRNGKey(self._rng.randint(1 << 31))
        valid_avg = valid_avg_prev = None
        epoch = 0
        pre_loss = post_loss = float('nan')
        for epoch in range(epochs):
            key, sub = jax.random.split(key)
            (self.params, self.opt_state, post_loss, pre_loss,
             valid_loss) = epoch_fn(self.params, self.opt_state,
                                    self.normalizer, tr_dev, te_dev,
                                    jnp.asarray(p_tr), jnp.asarray(p_te), sub)
            valid_loss = float(valid_loss)
            if valid_avg is None:
                valid_avg = 1.5 * valid_loss if valid_loss >= 0 \
                    else valid_loss / 1.5
                valid_avg_prev = 2 * valid_loss if valid_loss >= 0 \
                    else valid_loss / 2
            valid_avg = (rolling_average_persitency * valid_avg +
                         (1 - rolling_average_persitency) * valid_loss)
            if verbose and logger is not None:
                logger.log(f'Epoch {epoch} pre {float(pre_loss):.5f} '
                           f'post {float(post_loss):.5f} '
                           f'valid {valid_loss:.5f} avg {valid_avg:.5f}')
            if valid_avg_prev < valid_avg or epoch == epochs - 1:
                break
            valid_avg_prev = valid_avg
        if log_tabular and logger is not None:
            logger.logkv('Epochs', epoch)
            logger.logkv('Pre-Loss', float(pre_loss))
            logger.logkv('Post-Loss', float(post_loss))
        return dict(epochs=epoch, post_loss=float(post_loss))

    def _get_epoch_fn(self, cap_tr, cap_te, t_len, steps_per_epoch,
                      steps_test):
        ck = (cap_tr, cap_te, t_len, steps_per_epoch, steps_test)
        if ck in self._epoch_cache:
            return self._epoch_cache[ck]

        bs = self.batch_size
        mbs = self.meta_batch_size
        window = 2 * bs

        def sample_windows(data, n_valid, key):
            obs, act, delta = data
            kp, ko = jax.random.split(key)
            pidx = jax.random.randint(kp, (mbs,), 0, n_valid)
            offs = jax.random.randint(ko, (mbs,), bs, t_len - bs)

            def gather(p, off):
                sl = lambda a: jax.lax.dynamic_slice_in_dim(  # noqa: E731
                    a[p], off - bs, window, axis=0)
                return sl(obs), sl(act), sl(delta)

            return jax.vmap(gather)(pidx, offs)  # each (mbs, window, d)

        def epoch_fn(params, opt_state, norm, train, test, n_tr, n_te, key):
            def train_step(carry, k):
                params, opt_state = carry
                o, a, d = sample_windows(train, n_tr, k)

                def loss(p):
                    post, pre = self.meta_loss_fn(p, norm, o, a, d)
                    return post, pre

                (post, pre), grads = jax.value_and_grad(
                    loss, has_aux=True)(params)
                updates, opt_state = self.optimizer.update(grads, opt_state,
                                                           params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), (post, pre)

            keys = jax.random.split(key, steps_per_epoch + steps_test + 1)
            (params, opt_state), (posts, pres) = jax.lax.scan(
                train_step, (params, opt_state), keys[:steps_per_epoch])

            # validation: plain pre-update loss on random windows (reference
            # meta_mlp_dynamics.py:234-243)
            def valid_step(_, k):
                o, a, d = sample_windows(test, n_te, k)
                loss = self._mse(params, norm.norm_obs(o), norm.norm_act(a),
                                 norm.norm_delta(d))
                return None, loss

            _, vlosses = jax.lax.scan(valid_step, None,
                                      keys[steps_per_epoch:-1])
            return (params, opt_state, jnp.mean(posts), jnp.mean(pres),
                    jnp.mean(vlosses))

        if getattr(self, 'mesh', None) is not None:
            # sharded meta-learner: path-major train/valid arrays sharded
            # over the mesh 'env' axis (paths ARE env episodes), params
            # replicated; GSPMD inserts the gradient psums.
            # Lowering (asserted structurally in TestScalingStructure::
            # test_meta_epoch_on_mesh_structure): the GLOBAL random window
            # indices (a[pidx]) lower to masked LOCAL gathers + all-reduce
            # — only the sampled windows (meta_bs x window x dim) cross
            # the interconnect per train step; the dataset stays sharded
            # in HBM (no all-gather). Compute on the assembled windows is
            # replicated across the mesh: global indices are required for
            # numerics parity with the single-device program (the
            # sharded==single fit test), so the meta fit scales HBM
            # capacity, not FLOPs. The plain-MLP epoch is the true DP
            # path (mlp.py; TestScalingStructure).
            from learning_to_adapt_tpu.parallel import mesh as par_mesh
            fn = par_mesh.jit_epoch_sharded(self.mesh, epoch_fn, 8, {3, 4})
        else:
            fn = jax.jit(epoch_fn)
        self._epoch_cache[ck] = fn
        return fn

    # ------------------------------------------------------------- adapt
    def adapt_fn(self, params, norm, obs, act, obs_next):
        """Pure: per-env fast adaptation. obs/act/obs_next: (n_env, K, d).
        Returns params pytree with a leading env axis."""
        delta = obs_next - obs
        obs_n = norm.norm_obs(obs)
        act_n = norm.norm_act(act)
        delta_n = norm.norm_delta(delta)
        return jax.vmap(lambda o, a, d: self.inner_step_fn(params, o, a, d))(
            obs_n, act_n, delta_n)

    def adapt(self, obs, act, obs_next):
        """Host API: lists/arrays of per-env windows (reference
        meta_mlp_dynamics.py:321-345)."""
        obs = jnp.asarray(np.stack(obs))
        act = jnp.asarray(np.stack(act))
        obs_next = jnp.asarray(np.stack(obs_next))
        self._adapted_params = self._adapt_jit(self.params, self.normalizer,
                                               obs, act, obs_next)

    @functools.cached_property
    def _adapt_jit(self):
        return jax.jit(self.adapt_fn)

    def switch_to_pre_adapt(self):
        self._adapted_params = None

    # ------------------------------------------------------------- predict
    def predict_fn(self, params, norm, obs, act):
        """Pure single-parameter-set prediction (params may be adapted).
        Planner-path matmuls run in bf16 (f32 accumulate); the adaptation
        inner step and meta-training stay f32."""
        x = jnp.concatenate([norm.norm_obs(obs), norm.norm_act(act)], axis=-1)
        delta = core.mlp_forward(params, x, self.hidden_nonlinearity,
                                 self.output_nonlinearity,
                                 self.planner_compute_dtype)
        return obs + norm.denorm_delta(delta)

    def predict_adapted_fn(self, adapted_params, norm, obs, act):
        """obs/act: (n_env, n, d) routed to per-env adapted params."""
        return jax.vmap(lambda p, o, a: self.predict_fn(p, norm, o, a))(
            adapted_params, obs, act)

    def predict(self, obs, act):
        obs = jnp.asarray(obs)
        act = jnp.asarray(act)
        if self._adapted_params is not None:
            n_env = jax.tree.leaves(self._adapted_params)[0].shape[0]
            per = obs.shape[0] // n_env
            out = self._predict_adapted_jit(
                self._adapted_params, self.normalizer,
                obs.reshape(n_env, per, -1), act.reshape(n_env, per, -1))
            return np.asarray(out.reshape(obs.shape[0], -1))
        return np.asarray(self._predict_jit(self.params, self.normalizer,
                                            obs, act))

    @functools.cached_property
    def _predict_jit(self):
        return jax.jit(self.predict_fn)

    @functools.cached_property
    def _predict_adapted_jit(self):
        return jax.jit(self.predict_adapted_fn)

    @property
    def recurrent(self):
        return False

    @property
    def adapted(self):
        return self._adapted_params is not None

    def state_dict(self, include_data=False):
        """Snapshot pytrees. Dataset buffers are excluded by default (the
        reference's Serializable snapshots also carry only parameters +
        normalization, meta_mlp_dynamics.py:434-445); pass include_data=True
        for full-fidelity resume."""
        sd = dict(params=jax.device_get(self.params),
                  opt_state=jax.device_get(self.opt_state),
                  normalizer=jax.device_get(self.normalizer))
        if include_data:
            # full-fidelity resume: dataset buffers AND the split/shuffle RNG
            # (the train/valid composition of every future fit depends on it)
            sd.update(train=self._train, test=self._test,
                      rng_state=self._rng.get_state())
        return sd

    def load_state_dict(self, sd):
        self.params = jax.device_put(sd['params'])
        self.opt_state = jax.device_put(sd['opt_state'])
        self.normalizer = jax.device_put(sd['normalizer'])
        self._train = sd.get('train')
        self._test = sd.get('test')
        if sd.get('rng_state') is not None:
            self._rng.set_state(sd['rng_state'])
