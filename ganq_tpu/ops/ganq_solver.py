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


def _sstep_kernel(wt_ref, tt_ref, diag_ref, lt_hbm, qt_ref, werrt_ref,
                  lrow, sem, *, n: int):
    tm = wt_ref.shape[1]
    qt_ref[:] = jnp.zeros_like(qt_ref)
    werrt_ref[:] = jnp.zeros_like(werrt_ref)
    T = tt_ref[:]                                   # [16, TM]

    def step(i, r):
        j = n - 1 - i
        # start fetching L^T row (j-1) (== L[:, j-1]) for the residual
        dma = pltpu.make_async_copy(lt_hbm.at[pl.ds((j - 1) % n, 1), :],
                                    lrow, sem)
        dma.start()

        w_j = wt_ref[pl.ds(j, 1), :]                # [1, TM]
        eff = w_j + r / diag_ref[pl.ds(j, 1), :]    # [1, TM]

        # 16-way running-min nearest codeword (value + index)
        dmin = jnp.abs(eff - T[0:1, :])
        val = T[0:1, :]
        code = jnp.zeros((1, tm), jnp.float32)
        for s in range(1, 16):
            d = jnp.abs(eff - T[s:s + 1, :])
            better = (d < dmin).astype(jnp.float32)
            dmin = dmin + better * (d - dmin)
            val = val + better * (T[s:s + 1, :] - val)
            code = code + better * (s - code)

        werrt_ref[pl.ds(j, 1), :] = w_j - val
        qt_ref[pl.ds(j, 1), :] = code.astype(jnp.int32)

        dma.wait()
        # r = L[:, j-1]^T @ Werr^T   (rows < j of Werr^T are still zero)
        r = jax.lax.dot_general(
            lrow[:], werrt_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)     # [1, TM]
        return r

    jax.lax.fori_loop(0, n, step, jnp.zeros((1, tm), jnp.float32))


@functools.partial(jax.jit, static_argnames=("block_m",))
def s_step_pallas(W: jax.Array, L: jax.Array, T: jax.Array,
                  block_m: int = 256):
    """Fused S-step. W [m, n] f32, L [n, n] lower-tri f32, T [m, 16] f32.
    Returns (Q [m, n] int32, Werr [m, n] f32)."""
    m, n = W.shape
    tm = _pick_tile(m, (block_m, 256, 128))
    LT = L.T                                        # row j-1 = L[:, j-1]
    diag = jnp.diagonal(L).reshape(n, 1)

    qt, werrt = pl.pallas_call(
        functools.partial(_sstep_kernel, n=n),
        grid=(m // tm,),
        in_specs=[
            pl.BlockSpec((n, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # L^T stays in HBM
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
            pltpu.VMEM((1, n), jnp.float32),        # DMA'd L^T row
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * n,
            bytes_accessed=m * n * 4 * 2 + n * n * 4,
            transcendentals=0,
        ),
    )(W.T.astype(jnp.float32), T.T.astype(jnp.float32), diag, LT)
    return qt.T, werrt.T


def s_step_fits(m: int, n: int, block_m: int = 256) -> bool:
    """VMEM budget check: W^T + Werr^T + Q^T + diag blocks at [n, TM]."""
    tm = _pick_tile(m, (block_m, 256, 128))
    bytes_needed = tm * n * 4 * 4 + n * 4 * 2
    return (bytes_needed < 13 * 1024 * 1024 and n >= 128 and n % 8 == 0
            and m % 128 == 0)


__all__ = ["s_step_pallas", "s_step_fits"]
