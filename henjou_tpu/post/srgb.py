"""Linear -> sRGB encode + 8-bit quantize (reference: renderer.h:73-101)."""

from __future__ import annotations

import jax.numpy as jnp


def to_srgb(col: jnp.ndarray) -> jnp.ndarray:
    """Piecewise sRGB EOTF encode (reference toSRGB, renderer.h:73-80)."""
    inv_gamma = 1.0 / 2.4
    powed = jnp.power(jnp.maximum(col, 0.0), inv_gamma)
    return jnp.where(col < 0.0031308, 12.92 * col, 1.055 * powed - 0.055)


def quantize_u8(x: jnp.ndarray) -> jnp.ndarray:
    """min(x*256, 255) quantizer (reference quantizeUnsignedChar,
    renderer.h:82-85)."""
    return jnp.minimum(x * 256.0, 255.0).astype(jnp.uint8)


def float_to_srgb_u8(img: jnp.ndarray) -> jnp.ndarray:
    """[H,W,3] linear float -> uint8 sRGB (float4ConvertColor analogue,
    renderer.h:87-101)."""
    return quantize_u8(jnp.clip(to_srgb(img), 0.0, 1.0))
