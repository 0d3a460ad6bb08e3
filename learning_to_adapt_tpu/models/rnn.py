"""Recurrent dynamics model for ReBAL.

Capability parity with the reference RNNDynamicsModel
(dynamics/rnn_dynamics.py): LSTM/GRU/RNN cells over [B, T, obs+act] inputs
predicting per-step deltas; truncated BPTT with `backprop_steps` chunks whose
hidden state is carried forward while gradients are averaged across chunks
before a single optimizer update (reference rnn_dynamics.py:89-93, 173-189).
The TPU shape: the chunk loop is a `lax.scan` carrying (hidden, grad
accumulator) — no per-chunk host roundtrips or gradient placeholders.

Online adaptation is the hidden state itself: predict threads it
(rnn_dynamics.py:233-252), reset zeroes it per done env
(rnn_mpc_controller.py:139-163).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from learning_to_adapt_tpu.models import core
from learning_to_adapt_tpu.models.normalizer import Normalizer

PATH_CHUNK = 64


def _bucket_pow2(n):
    """Round a step/batch count to the nearest power of two (>=1) so the
    jitted epoch program recompiles O(log) times as the dataset grows,
    instead of every iteration."""
    if n <= 1:
        return 1
    return int(2 ** round(np.log2(n)))


class RNNDynamicsModel:
    def __init__(self, name, env, hidden_sizes=(256,), cell_type='lstm',
                 learning_rate=0.001, batch_size=10, backprop_steps=50,
                 normalize_input=True, output_nonlinearity=None,
                 valid_split_ratio=0.2, rolling_average_persitency=0.99,
                 seed=0, dtype=jnp.float32):
        self.name = name
        self.obs_dim = env.obs_dim
        self.act_dim = env.act_dim
        self.hidden_sizes = tuple(hidden_sizes)
        self.cell_type = cell_type
        self.batch_size = batch_size
        self.backprop_steps = backprop_steps
        self.learning_rate = learning_rate
        self.normalize_input = normalize_input
        self.output_nonlinearity = output_nonlinearity
        self.valid_split_ratio = valid_split_ratio
        self.rolling_average_persitency = rolling_average_persitency
        self.dtype = dtype

        init_cell, self._cell_step, self._zero_state = core.CELLS[cell_type]
        key = jax.random.PRNGKey(seed)
        in_dim = self.obs_dim + self.act_dim
        cells = []
        for h in self.hidden_sizes:
            key, sub = jax.random.split(key)
            cells.append(init_cell(sub, in_dim, h, dtype))
            in_dim = h
        key, sub = jax.random.split(key)
        out = core.init_mlp(sub, in_dim, (), self.obs_dim, dtype)
        self.params = {'cells': cells, 'out': out}
        # global-norm clipping protects the fit loop from occasional
        # outlier transitions (crash states); the reference's plain Adam
        # diverges irrecoverably on such data
        self.optimizer = optax.chain(optax.clip_by_global_norm(100.0),
                                     optax.adam(learning_rate))
        self.opt_state = self.optimizer.init(self.params)
        self.normalizer = Normalizer.init(self.obs_dim, self.act_dim, dtype)

        self._train = None
        self._test = None
        self._rng = np.random.RandomState(seed + 1)
        self._epoch_cache = {}

    # ------------------------------------------------------------- forward
    def get_initial_hidden(self, batch_size):
        """Zero hidden state tuple-per-layer (reference
        rnn_dynamics.py:273-293 tiles cell.zero_state)."""
        return tuple(self._zero_state(batch_size, h, self.dtype)
                     for h in self.hidden_sizes)

    def _step_core(self, params, hidden, x):
        """One time step through the stacked cells. x: (B, in_dim)."""
        new_hidden = []
        for cell_p, h in zip(params['cells'], hidden):
            h2, x = self._cell_step(cell_p, h, x)
            new_hidden.append(h2)
        delta_n = core.mlp_forward(params['out'], x, None,
                                   self.output_nonlinearity)
        return tuple(new_hidden), delta_n

    def forward_seq(self, params, norm, obs, act, hidden):
        """obs/act: (B, T, d). Returns (delta_n_pred (B,T,obs), hidden')."""
        x = jnp.concatenate([norm.norm_obs(obs), norm.norm_act(act)], -1)
        xt = jnp.swapaxes(x, 0, 1)  # (T, B, d) for scan

        def step(h, xi):
            h2, d = self._step_core(params, h, xi)
            return h2, d

        hidden, deltas = jax.lax.scan(step, hidden, xt)
        return jnp.swapaxes(deltas, 0, 1), hidden

    def predict_fn(self, params, norm, obs, act, hidden):
        """Single-step prediction threading hidden state: returns
        (obs + denorm(delta), hidden')."""
        x = jnp.concatenate([norm.norm_obs(obs), norm.norm_act(act)], -1)
        hidden, delta_n = self._step_core(params, hidden, x)
        return obs + norm.denorm_delta(delta_n), hidden

    def predict(self, obs, act, hidden):
        out, h = self._predict_jit(self.params, self.normalizer,
                                   jnp.asarray(obs), jnp.asarray(act), hidden)
        return np.asarray(out), h

    @functools.cached_property
    def _predict_jit(self):
        return jax.jit(self.predict_fn)

    # ------------------------------------------------------------------ fit
    def fit(self, obs, act, obs_next, epochs=1000, compute_normalization=True,
            valid_split_ratio=None, rolling_average_persitency=None,
            verbose=False, log_tabular=False, logger=None):
        assert obs.ndim == 3 and obs.shape[2] == self.obs_dim
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

        def pad(d, cap, count):
            out = []
            for k in ('obs', 'act', 'delta'):
                a = d[k]
                p = np.zeros((cap,) + a.shape[1:], a.dtype)
                p[:count] = a
                out.append(p)
            w = np.zeros((cap,), np.float32)
            w[:count] = 1.0
            return out, w

        tr_arrs, tr_w = pad(self._train, cap_tr, p_tr)
        te_arrs, te_w = pad(self._test, cap_te, p_te)
        from learning_to_adapt_tpu.parallel.mesh import (
            stage_fit_data, stage_model_state)
        # explicit learner-state restage (replaces params/opt_state/
        # normalizer with mesh-replicated copies when self.mesh is set)
        stage_model_state(self)
        tr_dev, te_dev = stage_fit_data(
            self, tuple(tr_arrs) + (tr_w,), tuple(te_arrs) + (te_w,))

        n_batches = _bucket_pow2(max(p_tr // self.batch_size, 1))
        epoch_fn = self._get_epoch_fn(cap_tr, cap_te, t_len, n_batches)

        key = jax.random.PRNGKey(self._rng.randint(1 << 31))
        valid_avg = valid_avg_prev = None
        epoch = 0
        train_loss = float('nan')
        for epoch in range(epochs):
            key, sub = jax.random.split(key)
            self.params, self.opt_state, train_loss, valid_loss = epoch_fn(
                self.params, self.opt_state, self.normalizer, tr_dev, te_dev,
                jnp.asarray(p_tr), sub)
            valid_loss = float(valid_loss)
            train_loss = float(train_loss)
            if valid_avg is None:
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
        return dict(epochs=epoch, train_loss=train_loss)

    def _get_epoch_fn(self, cap_tr, cap_te, t_len, n_batches):
        ck = (cap_tr, cap_te, t_len, n_batches)
        if ck in self._epoch_cache:
            return self._epoch_cache[ck]

        bs = self.batch_size
        bp = self.backprop_steps
        n_chunks = max(t_len // bp, 1)
        t_used = n_chunks * bp

        def chunk_loss(params, norm, hidden, o, a, d):
            pred_n, hidden2 = self.forward_seq(params, norm, o, a, hidden)
            loss = jnp.mean(jnp.square(pred_n - norm.norm_delta(d)))
            return loss, hidden2

        def batch_grads(params, norm, o, a, d):
            """TBPTT: scan over chunks, carry hidden (stop-grad across
            boundaries), average chunk gradients."""
            hidden0 = self.get_initial_hidden(o.shape[0])
            oc = o[:, :t_used].reshape(o.shape[0], n_chunks, bp, -1)
            ac = a[:, :t_used].reshape(a.shape[0], n_chunks, bp, -1)
            dc = d[:, :t_used].reshape(d.shape[0], n_chunks, bp, -1)

            def per_chunk(carry, xs):
                hidden, gacc, lacc = carry
                o_i, a_i, d_i = xs
                (loss, hidden2), grads = jax.value_and_grad(
                    chunk_loss, has_aux=True)(params, norm, hidden, o_i, a_i,
                                              d_i)
                hidden2 = jax.tree.map(jax.lax.stop_gradient, hidden2)
                gacc = jax.tree.map(jnp.add, gacc, grads)
                return (hidden2, gacc, lacc + loss), None

            zeros = jax.tree.map(jnp.zeros_like, params)
            xs = (jnp.swapaxes(oc, 0, 1), jnp.swapaxes(ac, 0, 1),
                  jnp.swapaxes(dc, 0, 1))
            (_, gsum, lsum), _ = jax.lax.scan(
                per_chunk, (hidden0, zeros, 0.0), xs)
            grads = jax.tree.map(lambda g: g / n_chunks, gsum)
            return grads, lsum / n_chunks

        def epoch_fn(params, opt_state, norm, train, test, n_tr, key):
            tr_obs, tr_act, tr_delta, tr_w = train
            te_obs, te_act, te_delta, te_w = test

            def train_step(carry, k):
                params, opt_state = carry
                pidx = jax.random.randint(k, (bs,), 0, n_tr)
                o, a, d = tr_obs[pidx], tr_act[pidx], tr_delta[pidx]
                grads, loss = batch_grads(params, norm, o, a, d)
                updates, opt_state = self.optimizer.update(grads, opt_state,
                                                           params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            keys = jax.random.split(key, n_batches)
            (params, opt_state), losses = jax.lax.scan(
                train_step, (params, opt_state), keys)

            # masked validation loss over the full test set
            hidden0 = self.get_initial_hidden(te_obs.shape[0])
            pred_n, _ = self.forward_seq(params, norm, te_obs, te_act,
                                         hidden0)
            err = jnp.mean(jnp.square(pred_n - norm.norm_delta(te_delta)),
                           axis=(1, 2))
            valid_loss = jnp.sum(err * te_w) / jnp.maximum(te_w.sum(), 1.0)
            return params, opt_state, jnp.mean(losses), valid_loss

        if getattr(self, 'mesh', None) is not None:
            # sharded recurrent learner: path-major sequences sharded over
            # the mesh 'env' axis, params replicated (parallel/mesh.py)
            from learning_to_adapt_tpu.parallel import mesh as par_mesh
            fn = par_mesh.jit_epoch_sharded(self.mesh, epoch_fn, 7, {3, 4})
        else:
            fn = jax.jit(epoch_fn)
        self._epoch_cache[ck] = fn
        return fn

    @property
    def recurrent(self):
        return True

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
