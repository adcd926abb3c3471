"""Fused GANQ S-step Pallas kernel.

The TPU analog of the reference's Metal ``compute_s`` kernel
(``gptqmodel/quantization/ganq.py:39-270``): the whole per-row backward
substitution — nearest-codeword assignment + residual GEMV — runs inside one
kernel with the working set resident in VMEM, instead of ``n`` separate
XLA ops per column (quant/ganq.s_step's lax.scan, which pays dispatch-scale
overhead every column).

Layout: everything is **transposed** ([n, TM] blocks) so the sequential
column walk indexes the *sublane* dimension — dynamic single-row reads and
writes, which Mosaic handles natively (a per-column walk in natural layout
would need dynamic single-lane stores).

Per grid program (one row block of W):
  - W^T block [n, TM], codebook T^T [16, TM], the evolving error matrix
    Werr^T [n, TM] (doubling as an output) all live in VMEM;
  - the loop walks columns j = n-1..0: ``eff = W[:,j] + r / L[j,j]``,
    16-way running-min nearest-codeword search (value + index tracked with
    arithmetic selects), writes ``Werr^T[j]`` and ``Q^T[j]``;
  - the residual ``r = L[:, j-1]^T @ Werr^T`` is one MXU matvec against an
    L^T row DMA'd from HBM while the VPU does the codeword search
    (rows < j of Werr^T are still zero, so no masking is needed).

Parity contract: identical Q indices to quant/ganq.s_step (tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(dim: int, candidates) -> int:
    for c in candidates:
        if dim % c == 0:
            return c
    return dim


def _sstep_kernel(wt_ref, tt_ref, diag_ref, bandpad_ref, ltpad_hbm,
                  qt_ref, werrt_ref, lbuf, sem, *, n: int, blk: int):
    """Column walk in 8-row blocks: HBM DMA slices must be 8-row aligned, so
    each outer step fetches 16 rows of the top-padded L^T (the current block
    plus the row below it) and the inner 8 steps index the buffer statically.
    """
    tm = wt_ref.shape[1]
    qt_ref[:] = jnp.zeros_like(qt_ref)
    werrt_ref[:] = jnp.zeros_like(werrt_ref)
    T = tt_ref[:]                                   # [16, TM]

    def outer(bo, r):
        bi = (n // blk) - 1 - bo                    # block index, top-down
        base = bi * blk
        # LTpad rows [base, base+blk+8) == L^T rows [base-8, base+blk):
        # inner step j = base+t consumes L^T row (j-1) at buffer row t+7.
        dma = pltpu.make_async_copy(ltpad_hbm.at[pl.ds(base, blk + 8), :],
                                    lbuf, sem)
        dma.start()

        wblk = wt_ref[pl.ds(base, blk), :]          # [blk, TM]
        dblk = diag_ref[pl.ds(base, blk), :]        # [blk, 1]
        # padded band rows [base, base+blk+8): row (t+7) holds
        # band[base+t-1] = (L[base+t-1+o, base+t-1])_o — the within-block
        # residual coefficients, all statically indexed
        bandblk = bandpad_ref[pl.ds(base, blk + 8), :]
        werr_rows = [None] * blk
        code_rows = [None] * blk
        dma.wait()

        # committed-rows residuals for the whole block in one MXU matmul:
        # row t = L^T[base+t-1] @ Werr^T(committed); current-block rows are
        # still zero in the ref and enter via the band corrections below
        Rblk = jax.lax.dot_general(
            lbuf[7:7 + blk, :], werrt_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)    # [blk, TM] (f32 operands)

        for t in range(blk - 1, -1, -1):
            eff = wblk[t:t + 1, :] + r / dblk[t:t + 1, :]
            dmin = jnp.abs(eff - T[0:1, :])
            val = T[0:1, :]
            code = jnp.zeros((1, tm), jnp.float32)
            for s in range(1, 16):
                d = jnp.abs(eff - T[s:s + 1, :])
                better = (d < dmin).astype(jnp.float32)
                dmin = dmin + better * (d - dmin)
                val = val + better * (T[s:s + 1, :] - val)
                code = code + better * (s - code)
            werr_rows[t] = wblk[t:t + 1, :] - val
            code_rows[t] = code

            # r = L[:, j-1]^T @ Werr^T: committed rows (from Rblk) plus the
            # current block's freshly computed rows (band corrections)
            r = Rblk[t:t + 1, :]
            for tp in range(t, blk):
                # coefficient L[base+tp, j-1] = band[j-1, tp-t+1]
                coef = bandblk[t + 7, tp - t + 1]
                r = r + coef * werr_rows[tp]

        werrt_ref[pl.ds(base, blk), :] = jnp.concatenate(werr_rows, axis=0)
        qt_ref[pl.ds(base, blk), :] = jnp.concatenate(
            code_rows, axis=0).astype(jnp.int32)
        return r

    jax.lax.fori_loop(0, n // blk, outer, jnp.zeros((1, tm), jnp.float32))


@functools.partial(jax.jit, static_argnames=("block_m", "blk"))
def s_step_pallas(W: jax.Array, L: jax.Array, T: jax.Array,
                  block_m: int = 256, blk: int = 8):
    """Fused S-step. W [m, n] f32, L [n, n] lower-tri f32, T [m, 16] f32.
    Returns (Q [m, n] int32, Werr [m, n] f32)."""
    m, n = W.shape
    tm = _pick_tile(m, (block_m, 256, 128))
    while n % blk:
        blk //= 2
    blk = max(blk, 8)
    Lf = L.astype(jnp.float32)
    # top-pad L^T by 8 zero rows so 16-row aligned DMAs cover row j-1 = -1
    LTpad = jnp.concatenate([jnp.zeros((8, n), jnp.float32), Lf.T], axis=0)
    diag = jnp.diagonal(Lf).reshape(n, 1)
    # diagonal band: band[r, o] = L[r+o, r], o in 0..15 (padded), then
    # top-padded by 8 rows to mirror LTpad indexing
    bw = blk + 8
    band = jnp.stack(
        [jnp.pad(jnp.diagonal(Lf, offset=-o), (0, o)) for o in range(bw)],
        axis=1)                                     # [n, blk+8]
    bandpad = jnp.concatenate([jnp.zeros((8, bw), jnp.float32), band], axis=0)

    qt, werrt = pl.pallas_call(
        functools.partial(_sstep_kernel, n=n, blk=blk),
        grid=(m // tm,),
        in_specs=[
            pl.BlockSpec((n, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n + 8, bw), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # padded L^T stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((n, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, m), jnp.int32),
            jax.ShapeDtypeStruct((n, m), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((blk + 8, n), jnp.float32),  # DMA'd L^T row block
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * n,
            bytes_accessed=m * n * 4 * 2 + n * n * 4,
            transcendentals=0,
        ),
    )(W.T.astype(jnp.float32), T.T.astype(jnp.float32), diag, bandpad, LTpad)
    return qt.T, werrt.T


def s_step_fits(m: int, n: int, block_m: int = 256) -> bool:
    """VMEM budget check: W^T + Werr^T + Q^T + diag blocks at [n, TM]."""
    tm = _pick_tile(m, (block_m, 256, 128))
    bytes_needed = tm * n * 4 * 4 + n * 4 * 2
    return (bytes_needed < 13 * 1024 * 1024 and n >= 128 and n % 8 == 0
            and m % 128 == 0 and n % 8 == 0)


__all__ = ["s_step_pallas", "s_step_fits"]
