"""Bit-packing of integer codes into int32 words (XLA-side).

The TPU replacement for the reference's CPU bit-twiddling ``pack()``
(``gptqmodel/nn_modules/qlinear/__init__.py:492-572``): a vectorized shift/or
reduction that runs on-device at save/load time.

Internal layout is **planar**: bit-slot ``p`` of word ``w`` holds the code of
column ``p * (n/packfactor) + w``. Unpacking a plane is a single shift+mask on
the whole packed block and yields a *contiguous* column range — exactly what
the Pallas kernels need (Mosaic cannot lower the minor-dim interleave reshape
the conventional little-endian layout would require). The GPTQ ecosystem's
interleaved layout is handled separately in ``formats/gptq_compat.py`` and
repacked to planar at load time (the analog of the reference's marlin repack,
``qlinear/marlin.py``).

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
    """Pack [..., n] integer codes (0..2^bits-1) into [..., n/packfactor] int32,
    planar layout."""
    slot = _bits_per_slot(bits)
    pf = 32 // slot
    n = idx.shape[-1]
    if n % pf != 0:
        raise ValueError(f"packing requires n % {pf} == 0, got n={n}")
    width = n // pf
    # plane p = columns [p*width, (p+1)*width)
    x = idx.astype(jnp.uint32).reshape(*idx.shape[:-1], pf, width)
    shifts = (jnp.arange(pf, dtype=jnp.uint32) * slot)[..., :, None]
    packed = jnp.sum(x << shifts, axis=-2, dtype=jnp.uint32)  # OR via sum
    return packed.astype(jnp.int32)


def unpack_plane(packed: jax.Array, bits: int, plane: int) -> jax.Array:
    """Extract plane ``plane`` -> [..., width] int32 codes (columns
    [plane*width, (plane+1)*width)). Pure shift+mask: Pallas-safe."""
    slot = _bits_per_slot(bits)
    u = packed.astype(jnp.uint32)
    return ((u >> jnp.uint32(slot * plane)) & jnp.uint32(2**slot - 1)).astype(
        jnp.int32) & (2**bits - 1)


def unpack_int_rows(packed: jax.Array, bits: int, n: int) -> jax.Array:
    """Inverse of pack_int_rows -> [..., n] int32 codes."""
    pf = pack_factor(bits)
    planes = [unpack_plane(packed, bits, p) for p in range(pf)]
    out = jnp.concatenate(planes, axis=-1)
    return out[..., :n]


__all__ = ["pack_int_rows", "unpack_int_rows", "unpack_plane", "pack_factor"]
