"""Train state + optimiser (reference parity: AdamW wd=1e-5, Adam for the
unimodal trainer, ReduceLROnPlateau(factor=0.5, patience=5)).

The LR schedule is plateau-driven on validation loss, stepped once per
epoch — host-side control flow, so it is implemented as a tiny pure-Python
state machine feeding ``optax.inject_hyperparams`` (the torch scheduler at
MRI_PET_OT_OT_per_epoch_attn.py:1209 steps per epoch too; a per-update
optax transform would count steps, not epochs).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state


class FusionTrainState(train_state.TrainState):
    """TrainState carrying BatchNorm statistics."""

    batch_stats: Any = None


def make_optimizer(
    learning_rate: float,
    weight_decay: float = 1e-5,
    kind: str = "adamw",
) -> optax.GradientTransformation:
    """AdamW(lr, wd=1e-5) like the fusion trainers (attn:1208) or plain
    Adam like the unimodal trainer (3D_resnet.py:947). Wrapped in
    inject_hyperparams so the plateau scheduler can rescale the LR
    without rebuilding optimiser state."""
    if kind == "adamw":
        return optax.inject_hyperparams(optax.adamw)(
            learning_rate=learning_rate, weight_decay=weight_decay
        )
    if kind == "adam":
        return optax.inject_hyperparams(optax.adam)(
            learning_rate=learning_rate
        )
    raise ValueError(f"unknown optimizer kind: {kind}")


def set_learning_rate(state: FusionTrainState, lr: float) -> FusionTrainState:
    """Overwrite the injected learning rate in-place (functionally).

    The new scalar keeps the old leaf's sharding so a mesh-replicated
    state stays consistently placed (a host-created single-device leaf
    inside an otherwise replicated tree would break the DP step's
    in_shardings contract)."""
    opt_state = state.opt_state
    old = opt_state.hyperparams["learning_rate"]
    new = jnp.asarray(lr, jnp.float32)
    if hasattr(old, "sharding"):
        sharding = old.sharding
        if getattr(sharding, "is_fully_addressable", True):
            new = jax.device_put(new, sharding)
        else:
            # Multi-host: device_put cannot target non-addressable
            # shardings (and its cross-process value assert can pair up
            # with unrelated calls when processes run primary-only code)
            # — assemble the replicated global scalar directly.
            new = jax.make_array_from_process_local_data(
                sharding, np.asarray(new), np.shape(new))
    opt_state.hyperparams["learning_rate"] = new
    return state.replace(opt_state=opt_state)


@dataclass
class ReduceLROnPlateau:
    """Epoch-level plateau scheduler (torch ReduceLROnPlateau parity:
    mode='min', factor=0.5, patience=5, relative improvement threshold
    1e-4 — attn:1209; without the threshold, noise-level improvements
    reset patience forever and the LR never decays)."""

    initial_lr: float
    factor: float = 0.5
    patience: int = 5
    min_lr: float = 0.0
    threshold: float = 1e-4

    def __post_init__(self):
        self.lr = self.initial_lr
        self.best = float("inf")
        self.bad_epochs = 0

    def step(self, metric: float) -> float:
        """Feed the epoch's validation loss; returns the (possibly reduced)
        learning rate to use next epoch."""
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.bad_epochs = 0
        return self.lr


def create_train_state(
    model,
    rng: jax.Array,
    sample_inputs: tuple,
    learning_rate: float,
    weight_decay: float = 1e-5,
    optimizer: str = "adamw",
    **apply_kwargs,
) -> FusionTrainState:
    """Initialise parameters/batch-stats and build the train state.

    ``sample_inputs`` are example args for ``model.init`` (tiny shapes are
    fine — parameter shapes don't depend on spatial dims).
    """
    init_rng, dropout_rng = jax.random.split(rng)
    variables = model.init(
        {"params": init_rng, "dropout": dropout_rng},
        *sample_inputs,
        train=False,
        **apply_kwargs,
    )
    return FusionTrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=make_optimizer(learning_rate, weight_decay, optimizer),
    )
