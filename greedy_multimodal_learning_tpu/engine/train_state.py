"""Training state: one pytree carrying everything the jitted step needs.

The reference splits this across the torch module (params + BN buffers +
MMTM plain-tensor running averages), the torch optimizer, and host-side
callback attributes (curation flags, BDR accumulators)
(reference: src/framework.py, src/callbacks.py).  Here it is a single
flax.struct pytree so the whole train step is a pure function — the natural
unit for jit, donation, and sharding.

The optimizer is optax SGD with torch semantics (weight decay added to the
gradient before the momentum trace, reference: train.py:48-51), wrapped in
``inject_hyperparams`` so the host-side ReduceLROnPlateau controller can
rescale the learning rate between epochs without recompiling.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from .controller import ControllerState, init_controller_state


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    mmtm: Any
    opt_state: Any
    controller: ControllerState
    step: jnp.ndarray  # () int32 global step
    rng: jnp.ndarray  # PRNG key for data augmentation


def make_optimizer(lr: float, momentum: float = 0.0, weight_decay: float = 0.0):
    """torch.optim.SGD(lr, weight_decay, momentum) equivalent
    (reference: train.py:48-51)."""

    def sgd(learning_rate):
        chain = []
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        if momentum:
            chain.append(optax.trace(decay=momentum, nesterov=False))
        chain.append(optax.scale_by_learning_rate(learning_rate))
        return optax.chain(*chain)

    return optax.inject_hyperparams(sgd)(learning_rate=lr)


def create_train_state(model, optimizer, rng, sample_batch, num_modalities=2, controller_seed=0):
    """Initialize model variables and build the TrainState."""
    init_rng, data_rng = jax.random.split(rng)
    variables = model.init(init_rng, sample_batch, train=False)
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        mmtm=variables.get("mmtm", {}),
        opt_state=optimizer.init(params) if optimizer is not None else None,
        controller=init_controller_state(num_modalities, controller_seed),
        step=jnp.asarray(0, jnp.int32),
        rng=data_rng,
    )


def get_learning_rate(state: TrainState) -> float:
    return float(state.opt_state.hyperparams["learning_rate"])


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    hyper = dict(state.opt_state.hyperparams)
    hyper["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=state.opt_state._replace(hyperparams=hyper))
