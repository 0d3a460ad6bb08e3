"""Feed-forward dynamics model for MB-MPC (and ensembles of it).

Capability parity with the reference MLPDynamicsModel
(dynamics/mlp_dynamics.py): predicts normalized state deltas, aggregates an
ever-growing dataset across iterations, early-stops on a rolling-average
validation loss. TPU-native shape: the whole training epoch is one jitted
`lax.scan` over shuffled minibatches living in HBM; the dataset is a
fixed-capacity padded buffer (static shapes; padding is masked out of losses
and stats) that re-pads in large chunks so jit recompiles only O(log) times
across a training run.

An optional ensemble axis (n_members > 1) vmaps init/training/prediction over
independently initialized members — the EP-like axis sharded across chips in
the multi-host configuration (BASELINE.json config #2).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from learning_to_adapt_tpu.models import core
from learning_to_adapt_tpu.models.normalizer import Normalizer

PAD_CHUNK = 16384


def _bucket_pow2(n):
    """Round a step/batch count to the nearest power of two (>=1) so the
    jitted epoch program recompiles O(log) times as the dataset grows,
    instead of every iteration."""
    if n <= 1:
        return 1
    return int(2 ** round(np.log2(n)))


def _pad_rows(arrs, count, chunk=PAD_CHUNK):
    """Pad numpy row-arrays to a multiple of `chunk`; returns padded arrays
    + weight vector."""
    cap = max(chunk, int(np.ceil(count / chunk)) * chunk)
    out = []
    for a in arrs:
        p = np.zeros((cap,) + a.shape[1:], a.dtype)
        p[:count] = a[:count]
        out.append(p)
    w = np.zeros((cap,), np.float32)
    w[:count] = 1.0
    return out, w


class MLPDynamicsModel:
    """predict(obs, act) -> obs + denorm(f(norm(obs, act)))."""

    def __init__(self, name, env, hidden_sizes=(512, 512),
                 hidden_nonlinearity='relu', output_nonlinearity=None,
                 batch_size=500, learning_rate=0.001, normalize_input=True,
                 valid_split_ratio=0.2, rolling_average_persitency=0.99,
                 n_members=1, seed=0, dtype=jnp.float32,
                 planner_compute_dtype=jnp.bfloat16):
        self.name = name
        self.obs_dim = env.obs_dim
        self.act_dim = env.act_dim
        self.hidden_sizes = tuple(hidden_sizes)
        self.hidden_nonlinearity = hidden_nonlinearity
        self.output_nonlinearity = output_nonlinearity
        self.batch_size = batch_size
        self.learning_rate = learning_rate
        self.normalize_input = normalize_input
        self.valid_split_ratio = valid_split_ratio
        self.rolling_average_persitency = rolling_average_persitency
        self.n_members = n_members
        self.dtype = dtype
        self.planner_compute_dtype = planner_compute_dtype

        key = jax.random.PRNGKey(seed)
        in_dim = self.obs_dim + self.act_dim

        def init_one(k):
            return core.init_mlp(k, in_dim, self.hidden_sizes, self.obs_dim,
                                 dtype)

        if n_members == 1:
            self.params = init_one(key)
        else:
            self.params = jax.vmap(init_one)(jax.random.split(key, n_members))
        # global-norm clipping protects the fit loop from occasional
        # outlier transitions (crash states); the reference's plain Adam
        # diverges irrecoverably on such data
        self.optimizer = optax.chain(optax.clip_by_global_norm(100.0),
                                     optax.adam(learning_rate))
        self.opt_state = self.optimizer.init(self.params)
        self.normalizer = Normalizer.init(self.obs_dim, self.act_dim, dtype)

        # host-side aggregated datasets (raw, unnormalized)
        self._train = None  # dict obs/act/delta numpy
        self._test = None
        self._rng = np.random.RandomState(seed + 1)
        self._epoch_cache = {}

    # ------------------------------------------------------------------ fit
    def fit(self, obs, act, obs_next, epochs=1000, compute_normalization=True,
            valid_split_ratio=None, rolling_average_persitency=None,
            verbose=False, log_tabular=False, logger=None):
        assert obs.ndim == 2 and obs.shape[1] == self.obs_dim
        assert act.ndim == 2 and act.shape[1] == self.act_dim
        obs = np.asarray(obs, np.float32)
        act = np.asarray(act, np.float32)
        delta = np.asarray(obs_next, np.float32) - obs
        if valid_split_ratio is None:
            valid_split_ratio = self.valid_split_ratio
        if rolling_average_persitency is None:
            rolling_average_persitency = self.rolling_average_persitency

        # normalization stats from this iteration's fresh data (reference
        # mlp_dynamics.py:106-108 recomputes per fit call)
        if self.normalize_input and (compute_normalization or
                                     self._train is None):
            self.normalizer = Normalizer.fit(
                jnp.asarray(obs), jnp.asarray(act), jnp.asarray(delta))

        # random train/valid split, then append to the aggregated datasets
        n = obs.shape[0]
        idx = self._rng.permutation(n)
        split = int(n * (1 - valid_split_ratio))
        tr, te = idx[:split], idx[split:]
        new_tr = dict(obs=obs[tr], act=act[tr], delta=delta[tr])
        new_te = dict(obs=obs[te], act=act[te], delta=delta[te])
        if self._train is None:
            self._train, self._test = new_tr, new_te
        else:
            self._train = {k: np.concatenate([self._train[k], new_tr[k]])
                           for k in new_tr}
            self._test = {k: np.concatenate([self._test[k], new_te[k]])
                          for k in new_te}

        n_train = self._train['obs'].shape[0]
        n_test = self._test['obs'].shape[0]
        (tr_obs, tr_act, tr_delta), tr_w = _pad_rows(
            [self._train['obs'], self._train['act'], self._train['delta']],
            n_train)
        (te_obs, te_act, te_delta), te_w = _pad_rows(
            [self._test['obs'], self._test['act'], self._test['delta']],
            n_test)
        n_batches = _bucket_pow2(max(n_train // self.batch_size, 1))
        epoch_fn = self._get_epoch_fn(tr_obs.shape[0], te_obs.shape[0],
                                      n_batches)

        from learning_to_adapt_tpu.parallel.mesh import (
            stage_fit_data, stage_model_state)
        # explicit learner-state restage (replaces params/opt_state/
        # normalizer with mesh-replicated copies when self.mesh is set)
        stage_model_state(self)
        tr_dev, te_dev = stage_fit_data(
            self, (tr_obs, tr_act, tr_delta, tr_w),
            (te_obs, te_act, te_delta, te_w))
        key = jax.random.PRNGKey(self._rng.randint(1 << 31))

        valid_avg = None
        valid_avg_prev = None
        epoch = 0
        train_loss = float('nan')
        for epoch in range(epochs):
            key, sub = jax.random.split(key)
            self.params, self.opt_state, train_loss, valid_loss = epoch_fn(
                self.params, self.opt_state, self.normalizer, tr_dev, te_dev,
                sub)
            valid_loss = float(valid_loss)
            train_loss = float(train_loss)
            if valid_avg is None:
                # rolling average seeded above the first value so training
                # never stops on epoch 0 (reference mlp_dynamics.py:177-186)
                valid_avg = 1.5 * valid_loss if valid_loss >= 0 \
                    else valid_loss / 1.5
                valid_avg_prev = 2 * valid_loss if valid_loss >= 0 \
                    else valid_loss / 2
            valid_avg = (rolling_average_persitency * valid_avg +
                         (1 - rolling_average_persitency) * valid_loss)
            if verbose and logger is not None:
                logger.log(f'Epoch {epoch} train {train_loss:.5f} '
                           f'valid {valid_loss:.5f} avg {valid_avg:.5f}')
            if valid_avg_prev < valid_avg or epoch == epochs - 1:
                break
            valid_avg_prev = valid_avg
        if log_tabular and logger is not None:
            logger.logkv('Epochs', epoch)
            logger.logkv('TrainLoss', train_loss)
            logger.logkv('ValidLoss', float(valid_avg))
        return dict(epochs=epoch, train_loss=train_loss)

    def _get_epoch_fn(self, n_train_cap, n_test_cap, n_batches):
        cache_key = (n_train_cap, n_test_cap, n_batches)
        if cache_key in self._epoch_cache:
            return self._epoch_cache[cache_key]

        bs = self.batch_size
        member_axis = 0 if self.n_members > 1 else None

        def loss_fn(params, norm, obs, act, delta, w):
            pred = self._forward_normalized(params, norm, obs, act)
            err = jnp.square(pred - norm.norm_delta(delta))
            return jnp.sum(jnp.mean(err, axis=-1) * w) / \
                jnp.maximum(jnp.sum(w), 1.0)

        def epoch_fn(params, opt_state, norm, train, test, key):
            tr_obs, tr_act, tr_delta, tr_w = train
            te_obs, te_act, te_delta, te_w = test
            perm = jax.random.permutation(key, tr_obs.shape[0])
            sel = perm[:n_batches * bs].reshape(n_batches, bs)

            def train_step(carry, idx):
                params, opt_state = carry
                o, a, d, w = (tr_obs[idx], tr_act[idx], tr_delta[idx],
                              tr_w[idx])
                loss, grads = jax.value_and_grad(loss_fn)(params, norm, o, a,
                                                          d, w)
                updates, opt_state = self.optimizer.update(grads, opt_state,
                                                           params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                train_step, (params, opt_state), sel)
            valid_loss = loss_fn(params, norm, te_obs, te_act, te_delta, te_w)
            return params, opt_state, jnp.mean(losses), valid_loss

        if getattr(self, 'mesh', None) is not None:
            # DP learner: train/valid rows sharded over the mesh 'env'
            # axis, params/opt-state replicated (parallel/mesh.py)
            from learning_to_adapt_tpu.parallel import mesh as par_mesh
            fn = par_mesh.jit_epoch_sharded(self.mesh, epoch_fn, 6, {3, 4})
        else:
            fn = jax.jit(epoch_fn)
        self._epoch_cache[cache_key] = fn
        return fn

    # -------------------------------------------------------------- predict
    def _forward_normalized(self, params, norm, obs, act, compute_dtype=None):
        """Normalized-space forward: returns normalized delta prediction."""
        x = jnp.concatenate([norm.norm_obs(obs), norm.norm_act(act)], axis=-1)
        if self.n_members > 1:
            # vmap over the member axis; inputs broadcast to all members.
            # NB ensembles deliberately stay on the XLA forward — the fused
            # Pallas kernel is not validated under vmap batching, so members
            # do not get the VMEM-fusion speedup (single-member models do).
            return jax.vmap(lambda p: core.mlp_forward(
                p, x, self.hidden_nonlinearity, self.output_nonlinearity,
                compute_dtype))(params)
        # plain XLA forward — measured faster than both custom Pallas
        # kernels on this path (fused MLP 0.5-0.6x, docs/DESIGN.md §1);
        # the kernels live on as benchmark-only modules (ops/fused_mlp.py,
        # ops/pallas_jacobi.py)
        return core.mlp_forward(params, x, self.hidden_nonlinearity,
                                self.output_nonlinearity, compute_dtype)

    def predict_fn(self, params, norm, obs, act):
        """Pure jittable prediction: obs' = obs + denorm(f(norm(obs,act))).
        Ensembles return the member mean (deterministic, planner-friendly).
        Runs the matmuls in the planner compute dtype (bf16 by default)."""
        delta_n = self._forward_normalized(params, norm, obs, act,
                                           self.planner_compute_dtype)
        if self.n_members > 1:
            delta_n = jnp.mean(delta_n, axis=0)
        return obs + norm.denorm_delta(delta_n)

    def predict(self, obs, act):
        return np.asarray(self._predict_jit(self.params, self.normalizer,
                                            jnp.asarray(obs),
                                            jnp.asarray(act)))

    @functools.cached_property
    def _predict_jit(self):
        return jax.jit(self.predict_fn)

    # --------------------------------------------------------- adaptation
    # MB-MPC does not adapt online; these are no-ops for API parity with the
    # meta/recurrent models (reference Sampler calls them only when
    # adapt_batch_size is set).
    def adapt(self, obs, act, obs_next):
        pass

    def switch_to_pre_adapt(self):
        pass

    @property
    def recurrent(self):
        return False

    # ------------------------------------------------------- checkpointing
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
