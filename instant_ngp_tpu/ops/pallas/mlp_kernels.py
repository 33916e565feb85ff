"""Fused MLP forward Pallas kernel (tcnn FullyFusedMLP analog).

The reference's FullyFusedMLP keeps all layer weights resident and runs
fwd+bwd for a 64-wide MLP in one CUDA kernel. On TPU the MXU wants
(128, 128) tiles; a 64-wide MLP underfills the MXU laterally, so the win
of fusing is keeping ALL weights in VMEM across the whole batch sweep
and never materializing inter-layer activations in HBM — one
pallas_call, grid over batch tiles, weights replicated to every tile.

Used as an inference fast path (rendering); training backward stays with
XLA autodiff (its fusion of the 64-wide matmuls is already near roofline
on bf16). Parity-tested against ops.mlp.MLP.apply in interpret mode.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def fused_mlp_forward(params: Sequence[jax.Array], x: jax.Array,
                      activation: str = "ReLU",
                      output_activation: str = "None",
                      tile: int = 512,
                      interpret: bool = False) -> jax.Array:
    """x (N, D_in) fp32/bf16 -> (N, D_out) fp32.

    params: list of (fan_in, fan_out) fp32 weight matrices (bias-free,
    as tcnn). All layers' weights stay in VMEM for the whole sweep."""
    n, d_in = x.shape
    n_layers = len(params)
    d_out = params[-1].shape[1]

    # pad feature dims to lane width so the MXU tiles cleanly
    LANE = 128
    dims = [d_in] + [w.shape[1] for w in params]
    padded = [_round_up(d, LANE) for d in dims]
    w_padded = []
    for i, w in enumerate(params):
        wp = jnp.zeros((padded[i], padded[i + 1]), jnp.float32)
        w_padded.append(wp.at[:w.shape[0], :w.shape[1]].set(w))

    n_pad = _round_up(n, tile)
    x_p = jnp.zeros((n_pad, padded[0]), x.dtype).at[:n, :d_in].set(x)

    def kernel(x_ref, *refs):
        w_refs = refs[:n_layers]
        out_ref = refs[n_layers]
        h = x_ref[:].astype(jnp.bfloat16)
        for i in range(n_layers):
            h = jnp.dot(h, w_refs[i][:].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            if i + 1 < n_layers:
                if activation == "ReLU":
                    h = jnp.maximum(h, 0.0)
                elif activation == "Sine":
                    h = jnp.sin(h)
                h = h.astype(jnp.bfloat16)
        if output_activation == "ReLU":
            h = jnp.maximum(h, 0.0)
        elif output_activation == "Exponential":
            h = jnp.exp(h)
        out_ref[:] = h.astype(jnp.float32)

    grid = (n_pad // tile,)
    in_specs = [pl.BlockSpec((tile, padded[0]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for li in range(n_layers):
        in_specs.append(pl.BlockSpec(
            (padded[li], padded[li + 1]), lambda i: (0, 0),
            memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, padded[-1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, padded[-1]), jnp.float32),
        interpret=interpret,
    )(x_p, *w_padded)
    return out[:n, :d_out]
