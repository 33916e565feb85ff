"""Disney-style BRDF shading, vectorized jnp.

Re-implements evaluate_shading (src/testbed_sdf.cu:76-145; the fork's
geometry mode carries an identical copy at testbed_geometry.cu:80-145):
Burley diffuse + GGX specular + sheen + clearcoat, with the reference's
ambient hack. Defaults per BRDFParams (sdf.h:62-72).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class BRDFParams:
    metallic: float = 0.0
    subsurface: float = 0.0
    specular: float = 1.0
    roughness: float = 0.5
    specular_tint: float = 0.0
    sheen: float = 0.0
    sheen_tint: float = 0.5
    clearcoat: float = 0.0
    clearcoat_gloss: float = 0.0
    basecolor: Tuple[float, float, float] = (0.8, 0.8, 0.8)
    ambientcolor: Tuple[float, float, float] = (0.0, 0.0, 0.0)


def _schlick_fresnel(u):
    m = jnp.clip(1.0 - u, 0.0, 1.0)
    return m ** 5


def _g1(ndoth, a):
    a2 = a * a
    t = 1.0 + (a2 - 1.0) * ndoth * ndoth
    val = (a2 - 1.0) / (np.pi * jnp.log(jnp.maximum(a2, 1e-8)) * t)
    return jnp.where(a >= 1.0, 1.0 / np.pi, val)


def _g2(ndoth, a):
    a2 = a * a
    t = 1.0 + (a2 - 1.0) * ndoth * ndoth
    return a2 / (np.pi * t * t)


def _smith_g_ggx(ndotv, alpha_g):
    a = alpha_g * alpha_g
    b = ndotv * ndotv
    return 1.0 / (ndotv + jnp.sqrt(jnp.maximum(a + b - a * b, 0.0)))


def evaluate_shading(base_color: jax.Array, ambient_color: jax.Array,
                     light_color: jax.Array, params: BRDFParams,
                     L: jax.Array, V: jax.Array, N: jax.Array) -> jax.Array:
    """All vector args (..., 3); scalars from params. Returns (..., 3)."""
    metallic = params.metallic
    ndotl = jnp.sum(N * L, axis=-1, keepdims=True)
    ndotv = jnp.sum(N * V, axis=-1, keepdims=True)
    H = L + V
    H = H / jnp.maximum(jnp.linalg.norm(H, axis=-1, keepdims=True), 1e-9)
    ndoth = jnp.sum(N * H, axis=-1, keepdims=True)
    ldoth = jnp.sum(L * H, axis=-1, keepdims=True)

    fl = _schlick_fresnel(ndotl)
    fv = _schlick_fresnel(ndotv)
    amb = ambient_color * (0.2 + (fv - 0.2) * metallic) * base_color

    luminance = jnp.sum(base_color * jnp.asarray([0.3, 0.6, 0.1]),
                        axis=-1, keepdims=True)
    ctint = base_color / (luminance + 1e-5)
    cspec0 = ((1.0 + (ctint - 1.0) * params.specular_tint)
              * params.specular * 0.08)
    cspec0 = cspec0 + (base_color - cspec0) * metallic
    csheen = 1.0 + (ctint - 1.0) * params.sheen_tint

    fd90 = 0.5 + 2.0 * ldoth * ldoth * params.roughness
    fd = (1 + (fd90 - 1) * fl) * (1 + (fd90 - 1) * fv)

    fss90 = ldoth * ldoth * params.roughness
    fss = (1 + (fss90 - 1) * fl) * (1 + (fss90 - 1) * fv)
    ss = 1.25 * (fss * (1.0 / jnp.maximum(ndotl + ndotv, 1e-6) - 0.5) + 0.5)

    a = max(0.001, params.roughness ** 2)
    ds = _g2(ndoth, a)
    fh = _schlick_fresnel(ldoth)
    fs = cspec0 + (1.0 - cspec0) * fh
    gs = _smith_g_ggx(jnp.maximum(ndotl, 1e-6), a) \
        * _smith_g_ggx(jnp.maximum(ndotv, 1e-6), a)

    fsheen = fh * params.sheen * csheen

    dr = _g1(ndoth, 0.1 + (0.001 - 0.1) * params.clearcoat_gloss)
    fr = 0.04 + 0.96 * fh
    gr = _smith_g_ggx(jnp.maximum(ndotl, 1e-6), 0.25) \
        * _smith_g_ggx(jnp.maximum(ndotv, 1e-6), 0.25)
    ccs = 0.25 * params.clearcoat * gr * fr * dr

    brdf = ((1.0 / np.pi) * (fd + (ss - fd) * params.subsurface) * base_color
            + fsheen) * (1.0 - metallic) + gs * fs * ds + ccs
    lit = brdf * light_color * ndotl + amb
    return jnp.where((ndotl < 0) | (ndotv < 0), amb, lit)
