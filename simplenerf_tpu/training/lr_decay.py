"""Learning-rate schedules as pure step->lr callables (optax-compatible).

NeRF exponential decay: lr = lr_init * 0.1^(step / (lr_decay * 1000))
(reference src/lr_decayers/NeRFLearningRateDecayer01.py:14-24).
MipNeRF log-lerp with sine warmup
(reference src/lr_decayers/MipNeRFLearningRateDecayer01.py:26-35).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def nerf_exponential(lr_init: float, lr_decay_thousands: float):
    decay_steps = lr_decay_thousands * 1000.0

    def schedule(step):
        return lr_init * (0.1 ** (step / decay_steps))

    return schedule


def mipnerf_loglerp(lr_init: float, lr_final: float, max_steps: int, lr_delay_steps: int = 0,
                    lr_delay_mult: float = 1.0):
    def schedule(step):
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
            )
        else:
            delay_rate = 1.0
        t = jnp.clip(step / max_steps, 0, 1)
        log_lerp = jnp.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)
        return delay_rate * log_lerp

    return schedule


def make_lr_schedule(optimizer_configs: dict, num_iterations: int = 0):
    name = optimizer_configs.get("lr_decayer_name", "NeRFLearningRateDecayer01")
    if name.startswith("NeRF"):
        return nerf_exponential(optimizer_configs["lr_initial"], optimizer_configs["lr_decay"])
    if name.startswith("MipNeRF"):
        return mipnerf_loglerp(
            optimizer_configs["lr_initial"],
            optimizer_configs.get("lr_final", optimizer_configs["lr_initial"] * 0.01),
            optimizer_configs.get("max_steps", num_iterations or 1),
            optimizer_configs.get("lr_delay_steps", 0),
            optimizer_configs.get("lr_delay_mult", 1.0),
        )
    raise ValueError(f"Unknown lr decayer: {name}")
