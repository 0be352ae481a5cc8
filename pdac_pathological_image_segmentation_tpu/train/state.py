"""TrainState: the functional core of the training runtime.

A pure pytree holding params, BatchNorm running stats, and Adam state,
replicated over the data mesh; one ``TrainState`` replaces the reference's
``model.state_dict()`` + ``optimizer.state_dict()`` pair
(``train_worker.py:116-120``).  The learning rate lives inside
``optax.inject_hyperparams`` so the plateau scheduler can change it between
epochs without recompiling the step.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct

from pdac_pathological_image_segmentation_tpu.config import Config


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @property
    def lr(self) -> jax.Array:
        return self.opt_state.hyperparams["learning_rate"]

    def with_lr(self, lr: float) -> "TrainState":
        hp = dict(self.opt_state.hyperparams)
        old = hp["learning_rate"]
        new = jnp.asarray(lr, dtype=jnp.float32)
        # keep the leaf's (replicated) sharding: a bare jnp.asarray is a
        # host-local single-device array, which multi-host Orbax refuses to
        # serialize (surfaced by tests/test_multihost.py at process_count=2)
        if isinstance(old, jax.Array):
            new = jax.device_put(new, old.sharding)
        hp["learning_rate"] = new
        return self.replace(opt_state=self.opt_state._replace(hyperparams=hp))

    def apply_gradients(self, grads: Any) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )

    def with_adam_moments(self, mu: Any, nu: Any, count: int) -> "TrainState":
        """Replace the Adam first/second moments and step count — used when
        resuming from a reference torch checkpoint whose ``optimizer``
        state_dict carries the moments (``train_worker.py:195``)."""
        def replace_adam(node):
            if isinstance(node, optax.ScaleByAdamState):
                return optax.ScaleByAdamState(
                    count=jnp.asarray(count, jnp.int32), mu=mu, nu=nu
                )
            return node

        new_opt_state = jax.tree_util.tree_map(
            replace_adam, self.opt_state,
            is_leaf=lambda n: isinstance(n, optax.ScaleByAdamState),
        )
        return self.replace(
            step=jnp.asarray(count, jnp.int32), opt_state=new_opt_state
        )


def make_optimizer(lr: float) -> optax.GradientTransformation:
    """Adam with torch defaults (b1=0.9, b2=0.999, eps=1e-8) — reference
    ``Adam(params, lr=cfg["lr"])`` at ``train_worker.py:184``."""
    return optax.inject_hyperparams(optax.adam)(
        learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8
    )


def create_train_state(
    cfg: Config,
    model: nn.Module,
    rng: jax.Array,
    input_shape: Optional[tuple] = None,
) -> TrainState:
    if input_shape is None:
        input_shape = (1, cfg.img_size, cfg.img_size, 3)
    # jit the init: one compiled (and persistently cacheable) program instead
    # of eager op-by-op dispatch — cuts cold-start from minutes to seconds on
    # remote-compile TPU backends
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng}, jnp.zeros(input_shape, jnp.float32), train=False
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(cfg.lr)
    opt_state = tx.init(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        tx=tx,
    )
