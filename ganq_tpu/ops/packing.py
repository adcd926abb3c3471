"""Bit-packing of integer codes into int32 words (XLA-side).

The TPU replacement for the reference's CPU bit-twiddling ``pack()``
(``gptqmodel/nn_modules/qlinear/__init__.py:492-572``): a vectorized shift/or
reduction that runs on-device at save/load time. Codes are packed along the
last (input-feature) axis, little-endian within each word, matching the GPTQ
qweight convention so ecosystem checkpoints can be re-packed losslessly.

3-bit codes are stored one-per-nibble (packfactor 8 in int32) rather than the
GPTQ 32/3 interleave: simpler, alignment-friendly, and converted on import.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bits_per_slot(bits: int) -> int:
    if bits == 3:
        return 4  # nibble-aligned storage
    return bits


def pack_factor(bits: int) -> int:
    return 32 // _bits_per_slot(bits)


def pack_int_rows(idx: jax.Array, bits: int) -> jax.Array:
    """Pack [..., n] integer codes (0..2^bits-1) into [..., n/packfactor] int32."""
    slot = _bits_per_slot(bits)
    pf = 32 // slot
    n = idx.shape[-1]
    if n % pf != 0:
        raise ValueError(f"packing requires n % {pf} == 0, got n={n}")
    x = idx.astype(jnp.uint32).reshape(*idx.shape[:-1], n // pf, pf)
    shifts = (jnp.arange(pf, dtype=jnp.uint32) * slot)
    # non-overlapping bit fields: OR-reduce == sum-reduce
    packed = jnp.sum(x << shifts, axis=-1, dtype=jnp.uint32)
    return packed.astype(jnp.int32)


def unpack_int_rows(packed: jax.Array, bits: int, n: int) -> jax.Array:
    """Inverse of pack_int_rows -> [..., n] int32 codes."""
    slot = _bits_per_slot(bits)
    pf = 32 // slot
    u = packed.astype(jnp.uint32)
    shifts = (jnp.arange(pf, dtype=jnp.uint32) * slot)
    codes = (u[..., None] >> shifts) & jnp.uint32(2**slot - 1)
    codes = codes.reshape(*packed.shape[:-1], packed.shape[-1] * pf)
    return codes[..., :n].astype(jnp.int32) & (2**bits - 1)


__all__ = ["pack_int_rows", "unpack_int_rows", "pack_factor"]
