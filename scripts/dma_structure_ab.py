"""DMA-structure A/B for the megastep pipeline (round-3 lead in ROADMAP.md).

The w8 megastep with all compute disabled still runs at ~520 GB/s effective
vs the 819 GB/s HBM spec (PERF.md round 2). Hypothesis space:
  (a) many concurrent input streams per grid step (the megastep streams ~8
      blocks with different index maps) fragment the DMA pipeline;
  (b) block size per stream is too small to amortize descriptor setup;
  (c) the sequential ("arbitrary") grid itself caps issue rate.

This script measures pure weight-streaming pallas kernels (one trivial
reduce per block so the stream cannot be DCE'd) across:
  - streams x block-rows grids: 1 fat stream vs 2/4/8 split streams
  - block sizes 0.5 MB .. 16 MB
  - parallel vs arbitrary grid semantics

Run on the real chip: PYTHONPATH=/root/repo python scripts/dma_structure_ab.py
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def stream_kernel(*refs, n_in: int):
    out = refs[n_in]
    acc = jnp.zeros((8, 128), jnp.int32)
    for i in range(n_in):
        # touch one 8x128 corner: forces the block DMA (BlockSpec fetches
        # the whole block) with negligible VPU work — a full-block reduce
        # here measures compute, not bandwidth
        acc += refs[i][0, 0:8, 0:128].astype(jnp.int32)
    out[:] = acc


def run_case(total_mb: int, n_streams: int, block_rows: int, lanes: int,
             semantics: str, reps: int = 8):
    total = total_mb * 1024 * 1024
    per_stream = total // n_streams
    rows = per_stream // lanes
    nblk = rows // block_rows
    if nblk < 2:
        return None
    arrs = [jnp.ones((1, nblk * block_rows, lanes), jnp.int8)
            for _ in range(n_streams)]
    CHAIN = 16   # amortize the ~25ms per-program dispatch of this runtime

    def once(*arrs):
        return pl.pallas_call(
            functools.partial(stream_kernel, n_in=n_streams),
            grid=(nblk,),
            in_specs=[pl.BlockSpec((1, block_rows, lanes),
                                   lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)
                      for _ in range(n_streams)],
            out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(semantics,),
                vmem_limit_bytes=112 * 1024 * 1024),
        )(*arrs)

    @jax.jit
    def go(*arrs):
        def body(c, _):
            return c + once(*arrs), None
        acc, _ = jax.lax.scan(body, jnp.zeros((8, 128), jnp.int32),
                              None, length=CHAIN)
        return acc

    np.asarray(go(*arrs))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(go(*arrs))
        best = min(best, time.perf_counter() - t0)
    gbps = CHAIN * nblk * block_rows * lanes * n_streams / best / 1e9
    return {"streams": n_streams, "block_mb": round(
        block_rows * lanes / 1e6, 2), "grid": nblk, "sem": semantics,
        "GBps": round(gbps, 1)}


def main():
    lanes = 3072                       # the 3B H dimension
    results = []
    cases = [("arbitrary", s, b) for s in (1, 2, 4, 8)
             for b in (128, 384, 1152)]
    cases += [("parallel", 1, 384), ("parallel", 4, 384)]
    # round-4: fat blocks (6.3 / 12.6 / 25 MB) — the r2 sweep stopped at
    # 3.5 MB; the megastep's qkv/MLP steps stream 12-25 MB per grid step
    cases += [("arbitrary", s, b) for s in (1, 2)
              for b in (2048, 4096, 8192)]
    for semantics, n_streams, block_rows in cases:
        r = run_case(768, n_streams, block_rows, lanes, semantics)
        if r:
            results.append(r)
            print(json.dumps(r), flush=True)
    best = max(results, key=lambda r: r["GBps"])
    print("BEST:", json.dumps(best))


if __name__ == "__main__":
    main()
