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
                  qt_ref, werrt_ref, lbuf, sem, *, n: int, blk: int,
                  nV: int = 16):
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
            for s in range(1, nV):
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
    """Fused S-step. W [m, n] f32, L [n, n] lower-tri f32, T [m, V] f32.
    Returns (Q [m, n] int32, Werr [m, n] f32)."""
    m, n = W.shape
    tm = _pick_tile(m, (block_m, 256, 128))
    while n % blk:
        blk //= 2
    blk = max(blk, 8)
    V = T.shape[1]
    Vp = max(8, V)
    Tt = T.T.astype(jnp.float32)
    if Vp != V:   # pad with last-codeword copies (never win a strict <)
        Tt = jnp.concatenate(
            [Tt, jnp.broadcast_to(Tt[-1:], (Vp - V, m))], axis=0)
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
        functools.partial(_sstep_kernel, n=n, blk=blk, nV=V),
        grid=(m // tm,),
        in_specs=[
            pl.BlockSpec((n, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Vp, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
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
    )(W.T.astype(jnp.float32), Tt, diag, bandpad, LTpad)
    return qt.T, werrt.T


def s_step_fits(m: int, n: int, block_m: int = 256) -> bool:
    """VMEM budget check: W^T + Werr^T + Q^T + diag blocks at [n, TM]."""
    tm = _pick_tile(m, (block_m, 256, 128))
    bytes_needed = tm * n * 4 * 4 + n * 4 * 2
    return (bytes_needed < 13 * 1024 * 1024 and n >= 128 and n % 8 == 0
            and m % 128 == 0 and n % 8 == 0)


# --------------------------------------------------- blocked-pipeline kernel
def _sstep_blk_kernel(wt_ref, tt_ref, lband_ref, band8_ref, lt_ref,
                      qt_ref, werrt_ref, r_ref, acc_ref, *, blk: int,
                      nb: int, prec, nV: int = 16):
    """One column block of the blocked S-step (grid = (m-tiles, col-blocks
    right-to-left), every operand auto-pipelined by BlockSpec — the round-2
    kernel's manual start();wait() DMAs were the measured bottleneck, not
    the math; see scripts/sstep_isolate2.py).

    Math (same assignments as quant/ganq.s_step): per column j = b0+t,
    ``r_j = R[j] + (in-block corrections)`` where the scratch
    ``R[c] = sum_{l >= b1} Werr[l] L[l, c]`` accumulates each finished
    block's contribution to every remaining column via ONE MXU matmul
    ``R += L[b0:b1, :]^T @ Werr[b0:b1]``. The in-block walk runs in
    8-column sub-blocks: within a sub-block the <=7 corrections are
    statically-unrolled scalar FMAs; each finished sub-block pushes its
    contribution to the rest of the block with one [8, blk] x [8, TM]
    mini-dot — O(blk) unrolled statements instead of O(blk^2), which keeps
    Mosaic compile time sane at blk = 128. All L coefficients are scalar
    reads, all row reads/writes static — no dynamic lane indexing.
    """
    tm = wt_ref.shape[1]
    f32 = jnp.float32
    bi = pl.program_id(1)

    @pl.when(bi == 0)
    def _():
        r_ref[:] = jnp.zeros_like(r_ref)

    base = (nb - 1 - bi) * blk
    # Every row/scalar below slices its REF directly — materializing whole
    # blocks as values ([blk, TM] = 128 KB) spills the vector register
    # file and cost ~9 ms/step in the first cut. Rows in flight are staged
    # through the OUTPUT refs (VMEM-resident until step end), not values.
    # The sub-block walk is a fori_loop (dynamic sb) so the unrolled body
    # is 8 columns, not blk — Mosaic compile time at blk=128 was ~7 min
    # with a fully-unrolled block. Same-sub-block L coefficients come from
    # the band8 operand (band8[j, o] = L[j+o, j], lanes STATIC) because a
    # dynamic lane index into L is not expressible.
    acc_ref[:] = jnp.zeros_like(acc_ref)            # in-block corrections

    def sub_block(sbo, carry):
        sb = blk // 8 - 1 - sbo
        j0 = sb * 8
        for t in range(7, -1, -1):
            r = (r_ref[pl.ds(base + j0 + t, 1), :]
                 + acc_ref[pl.ds(j0 + t, 1), :])
            for tp in range(t + 1, 8):              # same-sub-block terms
                # L[b0+j0+tp, b0+j0+t] = band8[b0+j0+t, tp-t]
                r = r + (band8_ref[pl.ds(base + j0 + t, 1), :][0, tp - t]
                         * werrt_ref[pl.ds(j0 + tp, 1), :])
            wrow = wt_ref[pl.ds(j0 + t, 1), :]
            eff = wrow + r / band8_ref[pl.ds(base + j0 + t, 1), :][0, 0]
            dmin = jnp.abs(eff - tt_ref[0:1, :])
            val = tt_ref[0:1, :]
            code = jnp.zeros((1, tm), f32)
            for s in range(1, nV):
                d = jnp.abs(eff - tt_ref[s:s + 1, :])
                better = (d < dmin).astype(f32)
                dmin = dmin + better * (d - dmin)
                val = val + better * (tt_ref[s:s + 1, :] - val)
                code = code + better * (s - code)
            werrt_ref[pl.ds(j0 + t, 1), :] = wrow - val
            qt_ref[pl.ds(j0 + t, 1), :] = code.astype(jnp.int32)
        # push the finished sub-block onto every remaining in-block column:
        # acc[c] += sum_t L[b0+j0+t, b0+c] * werr[j0+t]. Columns >= the
        # sub-block get zeros (L lower-tri) or pollute finished slots.
        acc_ref[:] += jax.lax.dot_general(
            lband_ref[pl.ds(j0, 8), :],
            werrt_ref[pl.ds(j0, 8), :], (((0,), (0,)), ((), ())),
            preferred_element_type=f32, precision=prec)
        return carry

    jax.lax.fori_loop(0, blk // 8, sub_block, jnp.int32(0))

    # push this block's contribution to every remaining (left) column:
    # R[c] += sum_t L[b0+t, c] * werr[t]  ==  L^T[:, b0:b1] @ werr_blk.
    # Rows >= b0 get polluted (L upper part is zero except the block's own
    # lower-tri, whose columns are never read again) — harmless.
    r_ref[:] += jax.lax.dot_general(
        lt_ref[:], werrt_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32, precision=prec)


@functools.partial(jax.jit, static_argnames=("block_m", "blk", "precision"))
def s_step_blocked_pallas(W: jax.Array, L: jax.Array, T: jax.Array,
                          block_m: int = 256, blk: int = 128,
                          precision: str = "highest"):
    """Blocked-pipeline S-step. W [m, n] f32, L [n, n] lower-tri f32,
    T [m, V] f32 (V = 2^bits) -> (Q [m, n] int32, Werr [m, n] f32).

    The production GANQ S-step (quant/ganq.ganq_quantize auto-selects it
    via :func:`s_step_blocked_fits`): ~40x the lax.scan path at the 1B
    down-proj shape on this runtime (scan pays ~0.6 ms of dispatch per
    column; here the whole chain runs in-kernel and the only O(m n^2) work
    is MXU matmuls). Matches the reference backsolve semantics
    (gptqmodel/quantization/ganq.py:533-567, the Metal compute_s design
    39-270) with fp-identical-in-practice assignments (parity-tested).
    """
    m, n = W.shape
    assert n % blk == 0, (n, blk)
    nb = n // blk
    tm = _pick_tile(m, (block_m, 256, 128))
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
    Lf = L.astype(jnp.float32)
    # band8[j, o] = L[j+o, j] (o in 0..7): the same-sub-block coefficient
    # table, lane-static (see kernel docstring)
    band8 = jnp.stack(
        [jnp.pad(jnp.diagonal(Lf, offset=-o), (0, o)) for o in range(8)],
        axis=1)
    # codebook width V = 2^bits (16/8/4): the nearest-codeword walk is
    # static over the TRUE V; the streamed T^T is row-padded to a sublane
    # multiple with copies of the last codeword (strict-less keeps the
    # first match, so duplicates never change an assignment)
    V = T.shape[1]
    Vp = max(8, V)
    Tt = T.T.astype(jnp.float32)
    if Vp != V:
        Tt = jnp.concatenate(
            [Tt, jnp.broadcast_to(Tt[-1:], (Vp - V, m))], axis=0)
    kern = functools.partial(_sstep_blk_kernel, blk=blk, nb=nb, prec=prec,
                             nV=V)
    qt, werrt = pl.pallas_call(
        kern,
        grid=(m // tm, nb),
        in_specs=[
            # W^T block for column-block bi (right-to-left), m-tile mi
            pl.BlockSpec((blk, tm), lambda mi, bi: (nb - 1 - bi, mi)),
            pl.BlockSpec((Vp, tm), lambda mi, bi: (0, mi)),
            # L[b0:b1, b0:b1] lower-tri band
            pl.BlockSpec((blk, blk),
                         lambda mi, bi: (nb - 1 - bi, nb - 1 - bi)),
            # band8[j, o] = L[j+o, j] — same-sub-block coefficients with a
            # STATIC lane index (dynamic lanes are not expressible)
            pl.BlockSpec((n, 8), lambda mi, bi: (0, 0)),
            # L^T[:, b0:b1] for the R-update matmul
            pl.BlockSpec((n, blk), lambda mi, bi: (0, nb - 1 - bi)),
        ],
        out_specs=[
            pl.BlockSpec((blk, tm), lambda mi, bi: (nb - 1 - bi, mi)),
            pl.BlockSpec((blk, tm), lambda mi, bi: (nb - 1 - bi, mi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, m), jnp.int32),
            jax.ShapeDtypeStruct((n, m), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((n, tm), jnp.float32),
                        pltpu.VMEM((blk, tm), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * n,
            bytes_accessed=m * n * 4 * 3 + n * n * 4 * (m // tm),
            transcendentals=0,
        ),
    )(W.T.astype(jnp.float32), Tt, Lf, band8, Lf.T)
    return qt.T, werrt.T


def s_step_blocked_fits(m: int, n: int, block_m: int = 256,
                        blk: int = 128) -> bool:
    """Eligibility for :func:`s_step_blocked_pallas`: lane/sublane-tileable
    shapes (blk = 128 — every operand's lane dim is a column block) and the
    [n, TM] + [n, blk] VMEM residents within budget."""
    tm = _pick_tile(m, (block_m, 256, 128))
    vmem = tm * n * 4 + n * blk * 4 * 2 + 4 * blk * tm * 4
    return (blk == 128 and n % blk == 0 and m % 128 == 0 and n >= 2 * blk
            and vmem < 90 * 1024 * 1024)


__all__ = ["s_step_pallas", "s_step_fits", "s_step_blocked_pallas",
           "s_step_blocked_fits"]
