"""Train state and torch-parity optimizers via optax.

The reference supports SGD / RMSprop / RAdam / SparseAdam / Adam with
L2-coupled weight decay (reference: src/models/smp/model.py:150-181, torch
semantics: wd*param is added to the gradient before the moment updates).
"""

from __future__ import annotations


import jax.numpy as jnp
import optax
from flax import core, struct


def make_optimizer(name: str, lr: float, weight_decay: float = 0.0
                   ) -> optax.GradientTransformation:
    parts = []
    if weight_decay and name != 'SAdam':
        # torch-style coupled L2: applied to the raw gradient, i.e. before
        # the optimizer's moment statistics
        parts.append(optax.add_decayed_weights(weight_decay))
    if name == 'SGD':
        parts.append(optax.sgd(lr))
    elif name == 'RMSprop':
        # torch RMSprop defaults: alpha=0.99, eps=1e-8, no momentum
        parts.append(optax.rmsprop(lr, decay=0.99, eps=1e-8))
    elif name == 'RAdam':
        parts.append(optax.radam(lr))
    elif name in ('Adam', 'SAdam'):
        parts.append(optax.adam(lr))
    else:
        raise ValueError(f'Unknown optimizer: {name}')
    return optax.chain(*parts)


class TrainState(struct.PyTreeNode):
    """Minimal mutable-free train state: params + BN stats + optimizer."""

    step: jnp.ndarray
    params: core.FrozenDict
    batch_stats: core.FrozenDict
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, batch_stats, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
        )

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )
