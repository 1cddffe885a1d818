"""Rectified Adam as an optax GradientTransformation.

Reference semantics: the vendored RAdam in ZEGGS/optimizers.py:7-99 —
variance rectification with SGD fallback when the SMA length N_sma < 5
(early steps), denominator sqrt(v_t) + eps *without* second-moment bias
correction, matching the torch implementation step for step. Being a pure
function of the integer step, the rectification needs none of the torch
version's 10-slot buffer caching.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class RAdamState(NamedTuple):
    step: jnp.ndarray
    exp_avg: optax.Updates
    exp_avg_sq: optax.Updates


def radam(learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0):
    """learning_rate: float or schedule fn(step) -> lr."""

    def init(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return RAdamState(jnp.zeros([], jnp.int32), zeros, jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params=None):
        step = state.step + 1
        stepf = step.astype(jnp.float32)
        exp_avg = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.exp_avg, grads)
        exp_avg_sq = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.exp_avg_sq, grads)

        beta2_t = b2**stepf
        n_sma_max = 2.0 / (1.0 - b2) - 1.0
        n_sma = n_sma_max - 2.0 * stepf * beta2_t / (1.0 - beta2_t)
        bias1 = 1.0 - b1**stepf

        rect = jnp.sqrt(
            jnp.clip(
                (1.0 - beta2_t) * (n_sma - 4.0) / (n_sma_max - 4.0)
                * (n_sma - 2.0) / n_sma * n_sma_max / (n_sma_max - 2.0),
                min=0.0,
            )
        ) / bias1
        sgd_step = 1.0 / bias1
        use_adam = n_sma >= 5.0

        lr = learning_rate(state.step) if callable(learning_rate) else learning_rate

        def upd(m, v, p):
            adam = -lr * rect * m / (jnp.sqrt(v) + eps)
            sgd = -lr * sgd_step * m
            u = jnp.where(use_adam, adam, sgd)
            if weight_decay != 0.0 and p is not None:
                u = u - lr * weight_decay * p
            return u

        if params is None:
            updates = jax.tree.map(lambda m, v: upd(m, v, None), exp_avg, exp_avg_sq)
        else:
            updates = jax.tree.map(upd, exp_avg, exp_avg_sq, params)
        return updates, RAdamState(step, exp_avg, exp_avg_sq)

    return optax.GradientTransformation(init, update)


def exponential_step_schedule(base_lr, decay, every=1000):
    """lr(i) = base_lr * decay**floor(i / every) — the reference's
    ExponentialLR stepped once per 1000 iterations (train.py:162-164,431-432).
    """

    def schedule(step):
        return base_lr * decay ** jnp.floor(step.astype(jnp.float32) / every)

    return schedule
