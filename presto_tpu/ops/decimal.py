"""Exact-decimal integer kernels.

Trino models short decimals as unscaled int64 with static (precision, scale)
(``core/trino-spi/.../type/DecimalType.java``, rounding in
``spi/type/Decimals.java``: HALF_UP = round half away from zero).  All money
math here is int64 on device — never floats — so aggregates are bit-exact.
"""

from __future__ import annotations

import jax.numpy as jnp

POW10 = [10**i for i in range(19)]


def rescale(x: jnp.ndarray, from_scale: int, to_scale: int) -> jnp.ndarray:
    """Change decimal scale; scale-down rounds half away from zero."""
    if to_scale == from_scale:
        return x
    if to_scale > from_scale:
        return x * jnp.int64(POW10[to_scale - from_scale])
    f = jnp.int64(POW10[from_scale - to_scale])
    return div_round_half_up(x, f)


def div_round_half_up(num: jnp.ndarray, den) -> jnp.ndarray:
    """num / den rounded half away from zero (Decimals.java HALF_UP)."""
    num = num.astype(jnp.int64)
    den = jnp.asarray(den, jnp.int64)
    sign = jnp.where((num < 0) ^ (den < 0), jnp.int64(-1), jnp.int64(1))
    an = jnp.abs(num)
    ad = jnp.abs(den)
    ad = jnp.maximum(ad, 1)  # caller guards div-by-zero → null
    q = an // ad
    rem = an - q * ad
    q = q + (rem * 2 >= ad).astype(jnp.int64)
    return sign * q


def decimal_div(x: jnp.ndarray, x_scale: int, y: jnp.ndarray, y_scale: int,
                result_scale: int) -> jnp.ndarray:
    """x/y at result_scale with HALF_UP (Trino DecimalOperators.divide:
    rescale numerator by 10^(result_scale + y_scale - x_scale), divide,
    round)."""
    shift = result_scale + y_scale - x_scale
    num = x.astype(jnp.int64)
    if shift > 0:
        num = num * jnp.int64(POW10[shift])
    elif shift < 0:
        num = div_round_half_up(num, POW10[-shift])
    return div_round_half_up(num, y)
