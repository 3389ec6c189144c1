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
