"""Nested JSON optimizer stack: Ema > ExponentialDecay > Adam.

Re-implements the tcnn optimizer compositions the reference builds from JSON
(`create_optimizer` src/testbed.cu:3727; configs/nerf/base.json:5-22:
Ema(decay=0.95) wrapping ExponentialDecay(0.33 @ 20k/10k) wrapping
Adam(lr=1e-2, betas=(0.9, 0.99), eps=1e-15, l2_reg=1e-6)).

Everything is a pure function over pytrees, jittable, and the whole state is
a pytree for orbax/msgpack checkpointing. Runtime hyperparam mutation walks
the nested config exactly like the reference (src/testbed.cu:4079-4085) —
see `update_hyperparams` (changing values triggers re-jit of train steps).

L2 regularization follows tcnn: it applies only to network matrix weights,
not to encoding tables — callers pass an `l2_mask` pytree selecting leaves.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


def _tree_zeros(params):
    return jax.tree_util.tree_map(jnp.zeros_like, params)


class Optimizer:
    """Composition of Ema / ExponentialDecay / Adam from a JSON config."""

    def __init__(self, config: Dict[str, Any]):
        self.config = copy.deepcopy(config)
        # unwrap the chain: [outermost, ..., Adam]
        self.chain = []
        node = self.config
        while node is not None:
            self.chain.append(node)
            node = node.get("nested")
        kinds = [n.get("otype") for n in self.chain]
        if kinds[-1] not in ("Adam", "Shampoo"):
            raise ValueError(f"innermost optimizer must be Adam-like, got {kinds}")
        # the only shipped Shampoo-flavored config (nerf/base.json envmap)
        # sets beta_shampoo=0.0, which interpolates 0% of the Kronecker
        # preconditioner — i.e. exactly Adam; treat it as such
        self._adam = self.chain[-1]
        self._decay = next((n for n in self.chain
                            if n.get("otype") == "ExponentialDecay"), None)
        self._ema = next((n for n in self.chain if n.get("otype") == "Ema"), None)

    # -- hyperparams ----------------------------------------------------
    @property
    def base_learning_rate(self) -> float:
        return float(self._adam.get("learning_rate", 1e-3))

    def set_learning_rate(self, lr: float) -> None:
        self._adam["learning_rate"] = float(lr)

    def update_hyperparams(self, partial_config: Dict[str, Any]) -> None:
        """Deep-merge new hyperparams into the nested chain (reference
        Optimizer::update_hyperparams semantics)."""
        def merge(dst, src):
            for k, v in src.items():
                if k == "nested" and "nested" in dst:
                    merge(dst["nested"], v)
                elif isinstance(v, dict) and isinstance(dst.get(k), dict):
                    merge(dst[k], v)
                else:
                    dst[k] = v
        merge(self.config, partial_config)
        self.__init__(self.config)

    def learning_rate(self, step) -> jnp.ndarray:
        """Effective LR at `step`, applying the ExponentialDecay schedule:
        multiply by decay_base every decay_interval steps once past
        decay_start, frozen after decay_end (tcnn ExponentialDecayOptimizer)."""
        lr = jnp.asarray(self.base_learning_rate, jnp.float32)
        if self._decay is not None:
            d = self._decay
            start = int(d.get("decay_start", 0))
            interval = max(int(d.get("decay_interval", 1)), 1)
            base = float(d.get("decay_base", 1.0))
            step_c = jnp.asarray(step, jnp.float32)
            if "decay_end" in d:
                step_c = jnp.minimum(step_c, float(d["decay_end"]))
            n = jnp.floor(jnp.maximum(step_c - start, 0.0) / interval +
                          (step_c >= start).astype(jnp.float32))
            lr = lr * base ** n
        return lr

    # -- state ----------------------------------------------------------
    def init(self, params) -> Dict[str, Any]:
        state = {
            "step": jnp.zeros((), jnp.int32),
            "m": _tree_zeros(params),
            "v": _tree_zeros(params),
        }
        if self._ema is not None:
            state["ema"] = jax.tree_util.tree_map(jnp.copy, params)
        return state

    def step(self, state, params, grads, l2_mask=None):
        """One optimizer step. Returns (new_params, new_state).

        l2_mask: pytree of bools (or None) — leaves where tcnn-style L2
        regularization (grad += l2_reg * param) applies."""
        a = self._adam
        beta1 = float(a.get("beta1", 0.9))
        beta2 = float(a.get("beta2", 0.999))
        eps = float(a.get("epsilon", 1e-8))
        l2 = float(a.get("l2_reg", 0.0))

        t = state["step"] + 1
        lr = self.learning_rate(state["step"])
        bias1 = 1.0 - beta1 ** t.astype(jnp.float32)
        bias2 = 1.0 - beta2 ** t.astype(jnp.float32)

        if l2 != 0.0 and l2_mask is not None:
            grads = jax.tree_util.tree_map(
                lambda g, p, m: g + l2 * p if m else g, grads, params, l2_mask)
        elif l2 != 0.0:
            grads = jax.tree_util.tree_map(lambda g, p: g + l2 * p, grads, params)

        new_m = jax.tree_util.tree_map(
            lambda m, g: beta1 * m + (1 - beta1) * g, state["m"], grads)
        new_v = jax.tree_util.tree_map(
            lambda v, g: beta2 * v + (1 - beta2) * g * g, state["v"], grads)
        new_params = jax.tree_util.tree_map(
            lambda p, m, v: p - lr * (m / bias1) / (jnp.sqrt(v / bias2) + eps),
            params, new_m, new_v)

        new_state = dict(state, step=t, m=new_m, v=new_v)
        if self._ema is not None:
            decay = float(self._ema.get("decay", 0.99))
            new_state["ema"] = jax.tree_util.tree_map(
                lambda e, p: decay * e + (1 - decay) * p,
                state["ema"], new_params)
        return new_params, new_state

    def inference_params(self, state, params):
        """Params to use for inference: the EMA copy when an Ema wrapper is
        present (tcnn EmaOptimizer; reference uses these for rendering)."""
        return state.get("ema", params)


def create_optimizer(config: Dict[str, Any]) -> Optimizer:
    return Optimizer(config)
