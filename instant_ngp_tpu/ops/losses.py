"""Loss library with exact reference semantics.

Two entry points:
- `loss_and_gradient(loss_type, target, prediction)` — elementwise loss and
  analytic d(loss)/d(prediction), matching the device-side switch the
  reference NeRF uses (nerf_device.cuh:74-145, dispatch at :600-616,
  including the Huber(0.1)/5 normalization).
- `create_loss(config)` — a mean-reduced scalar loss for the tcnn-style
  trainer path (image/sdf/volume modes, `create_loss` src/testbed.cu:3726).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax.numpy as jnp

from ..common import LossType


def l2_loss(target, prediction):
    d = prediction - target
    return d * d, 2.0 * d


def relative_l2_loss(target, prediction):
    d = prediction - target
    denom = prediction * prediction + 1e-2
    return d * d / denom, 2.0 * d / denom


def l1_loss(target, prediction):
    d = prediction - target
    return jnp.abs(d), jnp.sign(d)


def huber_loss(target, prediction, alpha=1.0):
    d = prediction - target
    ad = jnp.abs(d)
    loss = jnp.where(ad > alpha, ad - 0.5 * alpha, 0.5 / alpha * d * d)
    grad = jnp.where(ad > alpha, jnp.sign(d), d / alpha)
    return loss, grad


def log_l1_loss(target, prediction):
    d = prediction - target
    divisor = jnp.abs(d) + 1.0
    return jnp.log(divisor), jnp.sign(d) / divisor


def smape_loss(target, prediction):
    d = prediction - target
    denom = 0.5 * (jnp.abs(prediction) + jnp.abs(target)) + 1e-2
    return jnp.abs(d) / denom, jnp.sign(d) / denom


def mape_loss(target, prediction):
    d = prediction - target
    denom = jnp.abs(prediction) + 1e-2
    return jnp.abs(d) / denom, jnp.sign(d) / denom


def loss_and_gradient(loss_type: LossType, target, prediction
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Elementwise (loss, dloss/dprediction); reference nerf_device.cuh:600.

    Huber is evaluated with alpha=0.1 and divided by 5 so its L2 region
    matches plain L2 (see the comment in the reference dispatch)."""
    if loss_type == LossType.RelativeL2:
        return relative_l2_loss(target, prediction)
    if loss_type == LossType.L1:
        return l1_loss(target, prediction)
    if loss_type == LossType.Mape:
        return mape_loss(target, prediction)
    if loss_type == LossType.Smape:
        return smape_loss(target, prediction)
    if loss_type == LossType.Huber:
        loss, grad = huber_loss(target, prediction, 0.1)
        return loss / 5.0, grad / 5.0
    if loss_type == LossType.LogL1:
        return log_l1_loss(target, prediction)
    return l2_loss(target, prediction)


_TCNN_LOSSES: Dict[str, Callable] = {
    "L2": l2_loss,
    "RelativeL2": relative_l2_loss,
    "L1": l1_loss,
    "Huber": huber_loss,
    "LogL1": log_l1_loss,
    "SMAPE": smape_loss,
    "Smape": smape_loss,
    "MAPE": mape_loss,
    "Mape": mape_loss,
}


def create_loss(config: Dict[str, Any]) -> Callable:
    """Scalar training loss from a JSON config (tcnn create_loss equivalent).

    Returns fn(prediction, target) -> scalar mean loss. tcnn losses
    normalize by the number of elements; jnp.mean does the same."""
    otype = config.get("otype", "L2")
    if otype not in _TCNN_LOSSES:
        raise ValueError(f"unknown loss otype: {otype}")
    fn = _TCNN_LOSSES[otype]

    def loss_fn(prediction, target):
        loss, _ = fn(target, prediction)
        return jnp.mean(loss)

    loss_fn.otype = otype
    return loss_fn


def loss_type_from_string(name: str) -> LossType:
    """String mapping, reference src/testbed.cu:3592-3611."""
    return LossType(name)
