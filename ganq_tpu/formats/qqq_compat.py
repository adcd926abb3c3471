"""QQQ (W4A8) checkpoint format interop.

The reference's QQQ kernel module stores three tensors per linear
(``gptqmodel/nn_modules/qlinear/qqq.py:131-156``):

- ``B``        int32  [in/16, out*16/8] — int4 codes, marlin 16x16 tiled,
               thread-permuted, 8 nibbles per word
- ``s_group``  fp16   [in/group_size, out] — *relative* group scales
               (absolute group scale / s_channel), empty when per-channel
- ``s_channel``fp32   [1, out] — per-output-channel scale: the calibrated
               ``scale_extra`` from an 8-bit sym per-channel quantization of
               the original weight (``gptqmodel/quantization/qqq.py:21-35``)

Dequant semantics (``qqq.py:269-345`` pack, inverted here):

- grouped:      W[k, n] = (q4[k, n] - 8) * s_group[g(k), n] * s_channel[n]
                with q4 in [0, 15]
- channel-only: W[k, n] = q4[k, n] * (s_channel[n] * 16), q4 signed two's
                complement in [-8, 7] (the stored scale is pre-divided by
                2^(8-bits) for the kernel's int4->int8 shift trick)

The layout permutations (``_get_perms``, ``qqq.py:178-207``) are the
format's constants — reproduced exactly so artifacts round-trip against
vLLM/reference loaders. Everything here is pure numpy at pack time (runs
once at save/load, never in the serving path); the loaded artifact becomes
a standard ``uniform`` QLinear whose W4A8 math runs through
``ops/uniform_matmul.uniform_a8_matmul`` with ``scale_extra`` retained for
the calibrated int8 recode path.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

TILE = 16


def _perms(grouped: bool) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """The marlin thread permutations (format constants, qqq.py:178-207)."""
    perm = []
    for i in range(32):
        perm1 = []
        col = i // 4
        for block in (0, 1):
            for row in (4 * (i % 4), 4 * (i % 4) + 1,
                        4 * (i % 4) + 2, 4 * (i % 4) + 3):
                perm1.append(16 * row + col + 8 * block)
        for j in range(4):
            perm.extend(p + 256 * j for p in perm1)
    perm = np.asarray(perm, np.int64)
    if grouped:
        interleave = np.array([0, 2, 4, 6, 1, 3, 5, 7])
    else:
        interleave = np.array([4, 0, 5, 1, 6, 2, 7, 3])
    perm = perm.reshape(-1, 8)[:, interleave].ravel()
    scale_perm = np.asarray(
        [i + 8 * j for i in range(8) for j in range(8)], np.int64)
    scale_perm_single = np.asarray(
        [2 * i + j for i in range(4) for j in (0, 1, 8, 9, 16, 17, 24, 25)],
        np.int64)
    return perm, scale_perm, scale_perm_single


def _inv(p: np.ndarray) -> np.ndarray:
    inv = np.empty_like(p)
    inv[p] = np.arange(len(p))
    return inv


def _tile_forward(w: np.ndarray, perm: np.ndarray) -> np.ndarray:
    """[in, out] codes -> marlin-tiled + permuted [in/16, out*16]."""
    kin, out = w.shape
    w = w.reshape(kin // TILE, TILE, out // TILE, TILE)
    w = w.transpose(0, 2, 1, 3).reshape(kin // TILE, out * TILE)
    return w.reshape(-1, perm.size)[:, perm].reshape(kin // TILE, out * TILE)


def _tile_backward(res: np.ndarray, perm: np.ndarray, out: int) -> np.ndarray:
    """Inverse of :func:`_tile_forward` -> [in, out] codes."""
    rows = res.shape[0]
    kin = rows * TILE
    w = res.reshape(-1, perm.size)[:, _inv(perm)].reshape(rows, out * TILE)
    w = w.reshape(rows, out // TILE, TILE, TILE).transpose(0, 2, 1, 3)
    return w.reshape(kin, out)


def pack_qqq(q4: np.ndarray, group_scales: Optional[np.ndarray],
             scale_extra: np.ndarray, bits: int = 4
             ) -> Dict[str, np.ndarray]:
    """Pack int4 codes into the QQQ tensor dict.

    ``q4`` [out, in]: grouped -> unsigned codes in [0, 15] (zero point 8);
    channel-only -> signed codes in [-8, 7].
    ``group_scales`` [out, G] absolute fp scales (None/G==1 -> channel-only).
    ``scale_extra`` [out] per-channel fp scale.
    """
    if bits != 4:
        raise ValueError("the QQQ format is 4-bit only")
    out, kin = q4.shape
    if kin % TILE or out % TILE:
        raise ValueError("QQQ needs in/out divisible by 16")
    grouped = group_scales is not None and group_scales.shape[1] > 1
    perm, scale_perm, scale_perm_single = _perms(grouped)

    w = np.ascontiguousarray(q4.T.astype(np.int64))       # [in, out]
    s_extra = scale_extra.reshape(1, out).astype(np.float32)
    if grouped:
        G = group_scales.shape[1]
        s = (group_scales.T.astype(np.float32)
             / s_extra).astype(np.float16)                # [G, out] relative
        s = s.reshape(-1, scale_perm.size)[:, scale_perm].reshape(G, out)
        codes = w                                          # [0, 15]
    else:
        s_extra = (s_extra / (2 ** (8 - bits))).astype(np.float32)
        s = np.zeros((0, out), np.float16)
        codes = w & 0xF                                    # two's complement
    s_extra = s_extra.reshape(-1, scale_perm_single.size)[
        :, scale_perm_single].reshape(1, out)

    res = _tile_forward(codes, perm).astype(np.uint32)
    B = np.zeros((res.shape[0], res.shape[1] // 8), np.uint32)
    for i in range(8):
        B |= (res[:, i::8] & 0xF) << (4 * i)
    return {"B": B.astype(np.int32), "s_group": s,
            "s_channel": s_extra.astype(np.float32)}


def unpack_qqq(tensors: Dict[str, np.ndarray], bits: int = 4
               ) -> Tuple[np.ndarray, Optional[np.ndarray], np.ndarray]:
    """Inverse of :func:`pack_qqq`.

    Returns ``(q4 [out, in], group_scales [out, G] | None,
    scale_extra [out])`` with absolute group scales reconstructed.
    """
    B = tensors["B"].astype(np.uint32)
    s_group = tensors["s_group"]
    s_channel = tensors["s_channel"].astype(np.float32)
    out = s_channel.shape[-1]
    grouped = s_group is not None and s_group.size > 0
    perm, scale_perm, scale_perm_single = _perms(grouped)

    res = np.zeros((B.shape[0], B.shape[1] * 8), np.uint32)
    for i in range(8):
        res[:, i::8] = (B >> (4 * i)) & 0xF
    codes = _tile_backward(res.astype(np.int64), perm, out)  # [in, out]

    # scale perms apply per fixed-width chunk; invert chunkwise
    s_extra = s_channel.reshape(-1, scale_perm_single.size)[
        :, _inv(scale_perm_single)].reshape(out)

    if grouped:
        G = s_group.shape[0]
        s_abs = s_group.astype(np.float32).reshape(
            -1, scale_perm.size)[:, _inv(scale_perm)].reshape(G, out)
        s_abs = s_abs * s_extra[None, :]
        return codes.T, s_abs.T, s_extra
    q = codes.astype(np.int64)
    q = np.where(q >= 8, q - 16, q)                       # sign-extend nibble
    return q.T, None, s_extra * (2 ** (8 - bits))


__all__ = ["pack_qqq", "unpack_qqq"]
