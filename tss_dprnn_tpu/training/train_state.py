"""Train state pytree + torch-equivalent optimizer.

The optimizer chain reproduces the reference's
``torch.optim.Adam(lr, weight_decay)`` + ``clip_grad_norm_`` semantics
(reference trainer.py:43, 115-118): clip by global norm first (torch clips
before ``optimizer.step``), L2 weight decay *added to the gradient* before
the Adam moments (torch Adam's coupled decay, not AdamW), then Adam.
The learning rate is an injected hyperparameter so the host-side schedulers
(ReduceLROnPlateau / exponential decay) can update it between epochs without
recompiling.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    @property
    def variables(self) -> Dict[str, Any]:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params, opt_state=new_opt_state)

    def set_learning_rate(self, lr: float) -> "TrainState":
        opt_state = self.opt_state
        hp = dict(opt_state.hyperparams)
        new = jnp.asarray(lr, jnp.float32)
        old = hp.get("learning_rate")
        # keep the scalar committed to the same sharding as its predecessor —
        # an uncommitted replacement changes the jitted step's input aval and
        # forces a full recompile at the next epoch's first step
        if isinstance(old, jax.Array) and getattr(old, "sharding", None) is not None:
            new = jax.device_put(new, old.sharding)
        hp["learning_rate"] = new
        return self.replace(opt_state=opt_state._replace(hyperparams=hp))

    @property
    def learning_rate(self) -> float:
        return float(self.opt_state.hyperparams["learning_rate"])


def make_optimizer(
    learning_rate: float,
    weight_decay: float = 0.0,
    clip_norm: Optional[float] = None,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    @optax.inject_hyperparams
    def make(learning_rate):
        chain = []
        if clip_norm:
            chain.append(optax.clip_by_global_norm(clip_norm))
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        chain.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
        chain.append(optax.scale(-1.0 * learning_rate))
        return optax.chain(*chain)

    return make(learning_rate=learning_rate)


def create_train_state(model, rng, example_args, tx, example_kwargs=None) -> TrainState:
    variables = model.init(rng, *example_args, **(example_kwargs or {}))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )
