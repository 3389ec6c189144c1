"""Training for the GCN phage scorer.

The reference ships only a pre-trained checkpoint — "inference only;
no training code in repo" (SURVEY.md §2.2).  This module adds the
missing capability TPU-first: a jitted train step with

* **dp** — batch sharded over the mesh ``data`` axis (gradients are
  psum-reduced automatically by XLA from the sharding annotations);
* **tp** — the two giant dense layers (``pnode_d``: 12288×12288,
  ``d1``: 260800×100) sharded over the ``model`` axis
  (see parallel.mesh._GCN_PARAM_SPECS).

Loss is softmax cross-entropy on the two-class output.
"""
from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from palace_tpu.models.gcn import DEFAULT_CONFIG, GCNConfig, Params, forward


class TrainState(NamedTuple):
    params: Params
    opt_state: optax.OptState
    step: jnp.ndarray


def make_optimizer(learning_rate: float = 1e-4) -> optax.GradientTransformation:
    return optax.adam(learning_rate)


def init_train_state(params: Params, learning_rate: float = 1e-4) -> TrainState:
    opt = make_optimizer(learning_rate)
    return TrainState(params=params, opt_state=opt.init(params), step=jnp.zeros((), jnp.int32))


def loss_fn(params: Params, x_p: jnp.ndarray, x_f: jnp.ndarray, labels: jnp.ndarray,
            cfg: GCNConfig, dropout_key: Optional[jax.Array]) -> jnp.ndarray:
    logits = forward(params, x_p, x_f, cfg, dropout_key=dropout_key, return_logits=True)
    losses = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    return jnp.mean(losses)


@functools.partial(jax.jit, static_argnames=("cfg", "learning_rate"), donate_argnums=(0,))
def train_step(
    state: TrainState,
    x_p: jnp.ndarray,
    x_f: jnp.ndarray,
    labels: jnp.ndarray,
    key: jax.Array,
    cfg: GCNConfig = DEFAULT_CONFIG,
    learning_rate: float = 1e-4,
) -> Tuple[TrainState, jnp.ndarray]:
    """One SGD step.  Sharding of ``state.params`` / the batch decides
    the parallelism; under a mesh this compiles to dp grad-psum plus tp
    collectives with zero code changes."""
    opt = make_optimizer(learning_rate)
    loss, grads = jax.value_and_grad(loss_fn)(state.params, x_p, x_f, labels, cfg, key)
    updates, new_opt_state = opt.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(new_params, new_opt_state, state.step + 1), loss


def fit(
    features,
    labels,
    cfg: GCNConfig = DEFAULT_CONFIG,
    *,
    epochs: int = 1,
    batch_size: int = 64,
    learning_rate: float = 1e-4,
    seed: int = 0,
    mesh=None,
    ckpt_dir=None,
    ckpt_every: int = 0,
    init_state: Optional[TrainState] = None,
) -> Tuple[TrainState, list]:
    """Mini training loop over encoded features.

    features: (N, 3·64·64) float (from ops.encoder.transition_features)
    labels:   (N,) int {0 = non-phage, 1 = phage}

    With ``mesh`` the batch is sharded over the ``data`` axis and params
    over ``model`` (dp×tp).  ``ckpt_dir`` + ``ckpt_every`` enable orbax
    checkpointing; if the directory already holds a checkpoint, training
    resumes from it (the stage-artifact resume semantics of the
    reference driver, applied to training).  Returns the final state and
    the per-epoch mean losses.
    """
    import numpy as np

    from palace_tpu.models.gcn import init_params, model_inputs_from_features

    n = int(features.shape[0])
    if n == 0:
        raise ValueError("no training examples")
    key = jax.random.PRNGKey(seed)

    if init_state is None:
        key, pkey = jax.random.split(key)
        params = init_params(pkey, cfg)
        if mesh is not None:
            from palace_tpu.parallel.mesh import shard_params_for_gcn

            params = shard_params_for_gcn(params, mesh)
        state = init_train_state(params, learning_rate)
    else:
        state = init_state

    if ckpt_dir is not None:
        from palace_tpu.models.checkpoint import restore_train_state

        restored = restore_train_state(ckpt_dir, state)
        if restored is not None:
            state = restored

    data_shard = None
    if mesh is not None:
        from palace_tpu.parallel.mesh import data_sharding

        data_shard = data_sharding(mesh, 2)
        label_shard = data_sharding(mesh, 1)

    rng = np.random.default_rng(seed)
    host_step = int(jax.device_get(state.step))
    losses = []
    for _ in range(epochs):
        order = rng.permutation(n)
        epoch_losses = []
        for i in range(0, n, batch_size):
            idx = order[i : i + batch_size]
            while len(idx) < batch_size:  # keep one jit shape: wrap around
                idx = np.concatenate([idx, order[: batch_size - len(idx)]])
            xb = jnp.asarray(np.asarray(features)[idx])
            yb = jnp.asarray(np.asarray(labels)[idx].astype(np.int32))
            if data_shard is not None:
                xb = jax.device_put(xb, data_shard)
                yb = jax.device_put(yb, label_shard)
            x_p, x_f = model_inputs_from_features(xb, cfg)
            key, dkey = jax.random.split(key)
            state, loss = train_step(
                state, x_p, x_f, yb, dkey, cfg, learning_rate
            )
            epoch_losses.append(loss)
            host_step += 1  # mirrors state.step without a device sync
            if ckpt_dir is not None and ckpt_every and host_step % ckpt_every == 0:
                from palace_tpu.models.checkpoint import save_train_state

                save_train_state(ckpt_dir, state)
        losses.append(float(np.mean([jax.device_get(l) for l in epoch_losses])))
    if ckpt_dir is not None:
        from palace_tpu.models.checkpoint import save_train_state

        save_train_state(ckpt_dir, state)
    return state, losses
