"""Learning-rate schedule factory — parity with train_utils.get_scheduler
(train_utils.py:41-57): 'step' (the one main.py uses: gamma 0.9 per epoch),
'cosine', 'exponential', 'multistep'. Schedules are functions of the global
step; `spe` converts the reference's per-epoch semantics.
"""

from __future__ import annotations

import jax.numpy as jnp


def get_schedule(name: str, lr: float, num_epochs: int, spe: int):
    eps = 1e-8

    if name == "cosine":
        def schedule(step):
            epoch = jnp.minimum(step // spe, num_epochs)
            return eps + 0.5 * (lr - eps) * (
                1.0 + jnp.cos(jnp.pi * epoch / max(num_epochs, 1))
            )

    elif name == "exponential":
        def schedule(step):
            epoch = step // spe
            return lr * jnp.power(0.01, epoch)

    elif name == "multistep":
        def schedule(step):
            epoch = step // spe
            drops = ((epoch >= 2).astype(jnp.float32)
                     + (epoch >= 4).astype(jnp.float32)
                     + (epoch >= 8).astype(jnp.float32))
            return lr * jnp.power(0.5, drops)

    elif name == "step":
        def schedule(step):
            epoch = step // spe
            return lr * jnp.power(0.9, epoch)

    else:
        raise ValueError("lr scheduler not recognized!")

    return schedule
