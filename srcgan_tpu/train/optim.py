"""Optimizers and LR schedules with reference-parity semantics.

The reference's ``update_lr`` (trainCas.py:45-61, train.py:196-213) has unusual
observable behavior: it constructs a FRESH torch scheduler every epoch from the
optimizer's current LR and steps it once.  Consequences, replicated here and
exposed as ``reference_lr``:

  - 'cosine' (the default everywhere): CosineAnnealingLR(T_max=num_epochs)
    stepped once per epoch => the LR is multiplied by
    (1 + cos(pi/num_epochs))/2 each epoch — a mild compounding decay
    (~0.952x total over 50 epochs at T_max=50), NOT a true cosine arc.
  - 'step': StepLR(step_size=50) recreated each epoch never reaches step 50
    => LR is constant.
  - 'plateau': recreated each epoch => patience never accumulates => constant.

``true_cosine`` provides the conventional schedule for new training runs.
"""
from __future__ import annotations

import math

import optax


def reference_lr(policy: str, base_lr: float, num_epochs: int, epoch: int) -> float:
    """LR for ``epoch`` (1-based, after that epoch's update_lr call).

    'cosine'/'step'/'plateau'/'linear'/'none' replicate the reference's
    observable semantics (module docstring).  Two extensions beyond the
    reference, selected by name: 'true_cosine' (the conventional arc) and
    'warmup_cosine' (linear warmup over the first max(1, 5%) of epochs,
    then the cosine arc over the remainder — the standard large-batch
    production schedule)."""
    if policy == "cosine":
        factor = (1.0 + math.cos(math.pi / num_epochs)) / 2.0
        return base_lr * factor ** epoch
    # The arc is indexed epoch-1: the trainers call this at the START of
    # each 1-based epoch and hold the LR for the whole epoch, so epoch 1
    # must train at base_lr and epoch N at the last NONZERO cosine point —
    # indexing by `epoch` would spend the entire final epoch at exactly
    # lr=0 (a whole epoch of compute doing nothing).
    if policy == "true_cosine":
        return true_cosine(base_lr, num_epochs, epoch - 1)
    if policy == "warmup_cosine":
        warm = max(1, round(0.05 * num_epochs))
        if epoch <= warm:
            return base_lr * epoch / warm
        return true_cosine(base_lr, num_epochs - warm, epoch - warm - 1)
    if policy in ("step", "plateau", "linear", "none"):
        return base_lr
    raise NotImplementedError(f"learning rate policy [{policy}] is not implemented")


def true_cosine(base_lr: float, num_epochs: int, epoch: int,
                eta_min: float = 0.0) -> float:
    return eta_min + (base_lr - eta_min) * (
        1 + math.cos(math.pi * epoch / num_epochs)) / 2


# Torch-default Adam hyperparameters (trainCas.py:38-41 passes only lr).
# Single source of truth: trainers record these as `adam_hparams` so the
# hand-rolled updates that must match optax.adam bit-for-bit (the ZeRO-1
# sharded step) derive them from the trainer instead of re-hardcoding.
ADAM_HPARAMS = (0.9, 0.999, 1e-8)


def adam(lr: float = 1e-4, b1: float = ADAM_HPARAMS[0],
         b2: float = ADAM_HPARAMS[1],
         eps: float = ADAM_HPARAMS[2]) -> optax.GradientTransformation:
    """Adam with torch-default eps; LR is injected so schedules can update it
    without rebuilding optimizer state."""
    return optax.inject_hyperparams(optax.adam)(
        learning_rate=lr, b1=b1, b2=b2, eps=eps)


def set_lr(opt_state, lr: float):
    """Update the injected learning rate in-place-functionally."""
    return optax.tree_utils.tree_set(opt_state, learning_rate=lr)
