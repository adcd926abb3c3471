"""GPTQ uniform solver (JAX/XLA).

Re-implements the classic blocked error-compensating loop of the reference
(``gptqmodel/quantization/gptq.py:164-236``) as a jit-compiled program:
an unrolled Python loop over 128-column blocks (static shapes) with a
``lax.fori_loop`` over columns inside each block. Group scale/zero discovery,
static groups, act-sort/desc_act bookkeeping and the loss accounting follow
the reference exactly; see ``quantize()`` (gptq.py:239-375) for the outer
semantics (dead columns / damping are in ``preamble.py``).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import QuantizeConfig
from . import quantizer as qz
from .preamble import prepare

BLOCKSIZE = 128


@dataclass
class GPTQResult:
    Q: jax.Array               # [m, n] fake-quantized weight (original column order)
    scale: jax.Array           # [m, n_groups]
    zero: jax.Array            # [m, n_groups]
    g_idx: jax.Array           # [n] int32 column -> group map
    avg_loss: float
    damp_used: float
    nsamples: int
    qidx: Optional[jax.Array] = None  # [m, n] int codes (uniform grid), original order


def _masked_find_params(W_ref: jax.Array, start, gs: int, n: int, *,
                        bits: int, sym: bool, mse: float):
    """find_params over W_ref[:, start:start+gs] with overhang masked to 0.

    Masking the past-the-end columns to 0 is exact for the reference's search:
    min/max are clamped through 0 and the mse error of quantizing 0 is 0.
    """
    # dynamic_slice clamps an overhanging start to n-gs; mask out the columns
    # before the true group start that the clamped window drags in.
    cs = jnp.minimum(start, n - gs) if n >= gs else 0
    sl = jax.lax.dynamic_slice(W_ref, (0, cs), (W_ref.shape[0], gs))
    col_ids = cs + jnp.arange(gs)
    sl = jnp.where(col_ids[None, :] >= start, sl, 0.0)
    p = qz.find_params(sl, bits=bits, sym=sym, mse=mse)
    return p.scale, p.zero


@partial(jax.jit, static_argnames=("bits", "sym", "mse", "group_size", "static_groups",
                                  "use_perm_groups"))
def _gptq_core(W: jax.Array, Hinv: jax.Array, perm: Optional[jax.Array], *,
               bits: int, sym: bool, mse: float, group_size: int,
               static_groups: bool, use_perm_groups: bool):
    """The blocked quantization loop on the (already permuted) W.

    Returns (Q, Losses, scales, zeros) with scales/zeros per group in
    *processing* order (reference `_perform_quantization_loop`).
    """
    m, n = W.shape
    maxq = 2**bits - 1
    # group_size larger than the module width (e.g. the injected lm_head
    # g32 default on a tiny model, or g128 on a 64-wide projection) degrades
    # to a single group — reference find_params sees the same columns
    gs = min(group_size, n) if group_size != -1 else n
    n_groups = -(-n // gs)

    scales = jnp.zeros((m, n_groups), dtype=jnp.float32)
    zeros = jnp.zeros((m, n_groups), dtype=jnp.float32)

    if group_size == -1:
        # Single quantizer from the raw W (reference gptq.py:265 — computed
        # before the loop and never refreshed).
        p = qz.find_params(W, bits=bits, sym=sym, mse=mse)
        scales = p.scale
        zeros = p.zero
    elif static_groups:
        # Precompute per-group params from the block-start W. NOTE: W here
        # is POST-PERM, matching the reference exactly — its
        # _perform_quantization_loop receives the permuted W and computes
        # groups from it, then (with desc_act) indexes them by the ORIGINAL
        # column id (gptq.py:174-184, 208-213). Original GPTQ computed
        # static groups pre-permutation; our contract is the reference.
        for g in range(n_groups):
            s, z = _masked_find_params(W, g * gs, gs, n, bits=bits, sym=sym, mse=mse)
            scales = scales.at[:, g].set(s[:, 0])
            zeros = zeros.at[:, g].set(z[:, 0])

    Q = jnp.zeros_like(W)
    Losses = jnp.zeros_like(W)
    Qidx = jnp.zeros(W.shape, dtype=jnp.int32)

    cur_scale = scales[:, 0:1]
    cur_zero = zeros[:, 0:1]

    for i1 in range(0, n, BLOCKSIZE):
        i2 = min(i1 + BLOCKSIZE, n)
        count = i2 - i1
        W0 = W  # block-start snapshot: group params are discovered from this
        Wb = W[:, i1:i2]
        Hb = Hinv[i1:i2, i1:i2]

        def body(i, carry):
            Wb, Qb, Qib, Errb, Lossb, scales, zeros, cur_scale, cur_zero = carry
            col = i1 + i

            if group_size != -1 and not static_groups:
                def refresh(args):
                    scales, zeros, _, _ = args
                    s, z = _masked_find_params(W0, col, gs, n, bits=bits, sym=sym, mse=mse)
                    g = col // gs
                    scales = jax.lax.dynamic_update_slice(scales, s, (0, g))
                    zeros = jax.lax.dynamic_update_slice(zeros, z, (0, g))
                    return scales, zeros, s, z

                scales, zeros, cur_scale, cur_zero = jax.lax.cond(
                    col % gs == 0, refresh, lambda a: a,
                    (scales, zeros, cur_scale, cur_zero))
            elif group_size != -1 and static_groups:
                # With desc_act the group is keyed by the original column
                # (reference gptq.py:209-214).
                if use_perm_groups:
                    g = perm[col] // gs
                else:
                    g = col // gs
                cur_scale = jax.lax.dynamic_slice(scales, (0, g), (m, 1))
                cur_zero = jax.lax.dynamic_slice(zeros, (0, g), (m, 1))

            w = jax.lax.dynamic_slice(Wb, (0, i), (m, 1))[:, 0]
            d = Hb[i, i]
            q = qz.quantize_affine(w[:, None], cur_scale, cur_zero, maxq)[:, 0]
            qi = qz.quantize_affine_idx(w[:, None], cur_scale, cur_zero, maxq)[:, 0]
            err = (w - q) / d
            loss = (w - q) ** 2 / d**2

            Qb = jax.lax.dynamic_update_slice(Qb, q[:, None], (0, i))
            Qib = jax.lax.dynamic_update_slice(Qib, qi[:, None], (0, i))
            Errb = jax.lax.dynamic_update_slice(Errb, err[:, None], (0, i))
            Lossb = jax.lax.dynamic_update_slice(Lossb, loss[:, None], (0, i))

            # Propagate the error to remaining columns of the block
            # (cols > i; col i itself would just become q again).
            hrow = Hb[i, :]
            mask = jnp.arange(count) > i
            Wb = Wb - jnp.where(mask[None, :], err[:, None] * hrow[None, :], 0.0)
            return Wb, Qb, Qib, Errb, Lossb, scales, zeros, cur_scale, cur_zero

        init = (Wb, jnp.zeros_like(Wb), jnp.zeros(Wb.shape, jnp.int32),
                jnp.zeros_like(Wb), jnp.zeros_like(Wb),
                scales, zeros, cur_scale, cur_zero)
        Wb, Qb, Qib, Errb, Lossb, scales, zeros, cur_scale, cur_zero = (
            jax.lax.fori_loop(0, count, body, init))

        Q = Q.at[:, i1:i2].set(Qb)
        Qidx = Qidx.at[:, i1:i2].set(Qib)
        Losses = Losses.at[:, i1:i2].set(Lossb / 2.0)
        if i2 < n:
            W = W.at[:, i2:].add(
                -jnp.dot(Errb, Hinv[i1:i2, i2:], precision=jax.lax.Precision.HIGHEST))
        W = W.at[:, i1:i2].set(Qb)

    return Q, Qidx, Losses, scales, zeros


def gptq_quantize(W: jax.Array, H: jax.Array, qcfg: QuantizeConfig,
                  nsamples: int) -> GPTQResult:
    """Full GPTQ pipeline: preamble + blocked loop + perm/group bookkeeping.

    Output semantics match reference ``GPTQ.quantize`` (gptq.py:239-375):
    ``Q`` is the fake-quantized weight in the original column order; ``scale``/
    ``zero`` are per-group (processing order); ``g_idx`` maps original columns
    to groups (with the desc_act inverse-permutation applied).
    """
    prep = prepare(W, H, qcfg)
    act_sort = qcfg.resolved_act_sort()
    use_perm_groups = bool(qcfg.static_groups and qcfg.desc_act and prep.perm is not None)

    Q, Qidx, Losses, scales, zeros = _gptq_core(
        prep.W, prep.Hinv, prep.perm,
        bits=qcfg.bits, sym=qcfg.sym, mse=qcfg.mse,
        group_size=qcfg.group_size, static_groups=qcfg.static_groups,
        use_perm_groups=use_perm_groups,
    )

    n = W.shape[1]
    gs = min(qcfg.group_size, n) if qcfg.group_size != -1 else n

    if use_perm_groups:
        g_idx = np.asarray(prep.perm) // gs
    else:
        g_idx = np.arange(n) // gs
    g_idx = jnp.asarray(g_idx, dtype=jnp.int32)

    if prep.invperm is not None and act_sort != "none":
        # Restore original column order. The reference gates this on desc_act
        # (gptq.py:341-343), which silently returns permuted weights for
        # act_sort!=none with desc_act=False; we always restore.
        Q = Q[:, prep.invperm]
        Qidx = Qidx[:, prep.invperm]
        g_idx = g_idx[prep.invperm]

    avg_loss = float(jnp.sum(Losses)) / nsamples
    if np.isnan(avg_loss):
        raise FloatingPointError("GPTQ: NaN loss — increase damp or calibration data.")

    return GPTQResult(
        Q=Q, scale=scales, zero=zeros, g_idx=g_idx,
        avg_loss=avg_loss, damp_used=prep.damp_used, nsamples=nsamples,
        qidx=Qidx,
    )


__all__ = ["GPTQResult", "gptq_quantize", "BLOCKSIZE"]
