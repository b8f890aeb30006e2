'''
Optimizer + learning-rate schedule construction.

Mirrors /root/reference/train.py:226-243: sgd / adam / adamw / lamb at learn_rate with a
MultiStepLR decay of `lr_decay` at 2/5, 3/5, 4/5 of the epoch budget, plus global-norm
gradient clipping (train.py:99-101, default 0.3). torch AdamW defaults (betas 0.9/0.999,
eps 1e-8, weight_decay 0.01) are reproduced.
'''

from typing import Optional

import optax


def multistep_schedule(learn_rate: float, lr_decay: float, num_epochs: int,
                       steps_per_epoch: int) -> optax.Schedule:
    milestones = [(num_epochs * 2) // 5, (num_epochs * 3) // 5, (num_epochs * 4) // 5]
    boundaries = {}
    for m in milestones:
        step = m * steps_per_epoch
        # Repeated milestones (tiny num_epochs) compound, like torch MultiStepLR.
        boundaries[step] = boundaries.get(step, 1.0) * lr_decay
    return optax.piecewise_constant_schedule(learn_rate, boundaries)


def make_optimizer(optimizer: str = 'adamw', learn_rate: float = 1e-4, lr_decay: float = 0.3,
                   num_epochs: int = 70, steps_per_epoch: int = 1,
                   gradient_clip: float = 0.3,
                   schedule: Optional[optax.Schedule] = None) -> optax.GradientTransformation:
    if schedule is None:
        schedule = multistep_schedule(learn_rate, lr_decay, num_epochs, steps_per_epoch)
    if optimizer == 'sgd':
        tx = optax.sgd(schedule)
    elif optimizer == 'adam':
        tx = optax.adam(schedule, b1=0.9, b2=0.999, eps=1e-8)
    elif optimizer == 'adamw':
        tx = optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)
    elif optimizer == 'lamb':
        tx = optax.lamb(schedule)
    else:
        raise ValueError(f'unknown optimizer: {optimizer}')
    if gradient_clip > 0.0:
        tx = optax.chain(optax.clip_by_global_norm(gradient_clip), tx)
    return tx
