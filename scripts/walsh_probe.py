"""Walsh plane-expansion LUT decode probe (round-5 flagship lead).

Question: can a TRUE per-row 8-entry codebook (GANQ bits=3 LUT — the
paper's GANQ-3 configuration) be served at 3 bits/weight streamed, with
the dequant done as MXU algebra instead of per-element gathers?

The trick: any function on 3 bits is a sum of 8 XOR-monomials
  T[r, q] = c0[r] + sum_S c_S[r] * (XOR of q's bits in S)
so  x . T[r, q_r] = c0[r] * sum(x) + sum_S c_S[r] * (x . m_S(q_r))
where m_S(q_r) is the 0/1 bit-plane of monomial S. Only the 3 LINEAR
bit-planes are STORED (3 bits/weight); the 4 interaction planes are
XOR-DERIVED in-kernel (1 vector op per byte = 1/8 op per weight). Each
plane packs 8 output rows per byte; the 8 per-row bit dots come from the
same masked-prefix-dot algebra as the uniform plane kernels (7 ANDs per
byte per plane). Decode cost ladder measured here:

  w3     : uniform bits=3 baseline (10 dots, 7 masks / 8 rows)   [today]
  walsh3 : BCQ/linear-only codebook, 3 planes (24 dots, 21 ANDs) [4 DOF]
  walsh7 : EXACT arbitrary 8-entry LUT, 7 planes (56 dots, 49 ANDs) [8 DOF]

All variants stream IDENTICAL bytes (3 bits/weight + coef rows); the
delta is pure VPU/MXU decode cost. If walsh7 holds the W3 stream rate,
the GANQ paper's LUT-mpGEMM thesis is servable on TPU at full accuracy.

Run on the real chip: PYTHONPATH=/root/repo python scripts/walsh_probe.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ganq_tpu.ops.megastep_lowbit import (_derive, _plan_meta, _plane_pack,
                                          _recover)

_DEF = jax.lax.Precision.DEFAULT

from ganq_tpu.ops.megastep_lowbit import (  # noqa: E402
    _MONO, _walsh_derive1, _walsh_plane_pack, _walsh_recover1,
    _walsh_views, walsh_coef)

walsh_pack = _walsh_plane_pack


def _walsh_derive(planes, tF):
    out = []
    for P in planes:
        out.extend(_walsh_derive1(P))
    return out


def _walsh_views_n(P0, P1, P2, nmono):
    return _walsh_views([P0, P1, P2], nmono)


def _kernel_walsh(x_ref, pk_ref, cf_ref, y_ref, dd_s, s_s,
                  *, B, R, K, csz, nmono, nsub, nrep=1):
    """One grid step per repetition: the whole packed matrix is the block
    (megastep-like granularity, ~3.6 MB/step), the column walk is an
    IN-KERNEL loop over csz chunks with per-plane dots — exactly the
    structure a walsh megastep phase would use. nrep amortizes the
    per-pallas-execution floor of this runtime."""
    g = pl.program_id(0)
    NC = K // csz
    tF = R // 8 // nsub

    y_acc = []
    for sub in range(nsub):
        # pack layout is TILE-major (walsh_pack(codes, R // nsub)):
        # sub-tile `sub` holds its 3 planes consecutively
        P0 = pk_ref[pl.ds((sub * 3 + 0) * tF, tF), :]
        P1 = pk_ref[pl.ds((sub * 3 + 1) * tF, tF), :]
        P2 = pk_ref[pl.ds((sub * 3 + 2) * tF, tF), :]
        planes = _walsh_views_n(P0, P1, P2, nmono)
        y = jnp.zeros((B, 8 * tF), jnp.float32)
        for ci in range(NC):
            xs = x_ref[:, pl.ds(ci * csz, csz)]
            S = jnp.sum(xs.astype(jnp.int32), axis=1, keepdims=True)
            y = y + cf_ref[0, pl.ds(sub * 8 * tF, 8 * tF)][None, :] \
                * S.astype(jnp.float32)
            for p in range(nmono):
                Pp = planes[p][:, pl.ds(ci * csz, csz)] if NC > 1 \
                    else planes[p]
                rhs = jnp.concatenate(_walsh_derive([Pp], tF), axis=0)
                dd = jax.lax.dot_general(
                    xs, rhs, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32, precision=_DEF)
                z = _walsh_recover1(dd, tF)
                cf = cf_ref[1 + p, pl.ds(sub * 8 * tF, 8 * tF)]
                y = y + cf[None, :] * z.astype(jnp.float32)
        y_acc.append(y)

    @pl.when(g == nrep - 1)
    def _():
        for sub in range(nsub):
            y_ref[:, pl.ds(sub * 8 * tF, 8 * tF)] = y_acc[sub]


def _kernel_w3(x_ref, pk_ref, sc_ref, y_ref, dd_s, s_s,
               *, B, R, K, csz, nsub, nrep=1):
    """Uniform bits=3 baseline with the SAME in-kernel chunk structure:
    3-plane field algebra (10 derived views per 8 rows), per-row scale."""
    metas, coef, nd, g_r = _plan_meta(3)
    g = pl.program_id(0)
    NC = K // csz
    tF = R // 8 // nsub

    y_acc = []
    for sub in range(nsub):
        bg = pk_ref[pl.ds(sub * 3 * tF, 3 * tF), :]
        y = jnp.zeros((B, 8 * tF), jnp.float32)
        for ci in range(NC):
            xs = x_ref[:, pl.ds(ci * csz, csz)]
            bgc = bg[:, pl.ds(ci * csz, csz)] if NC > 1 else bg
            rhs = jnp.concatenate(_derive(bgc, tF, metas), axis=0)
            dd = jax.lax.dot_general(xs, rhs, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.int32,
                                     precision=_DEF)
            S = jnp.sum(xs.astype(jnp.int32), axis=1, keepdims=True)
            zs = _recover(dd, tF, metas, coef, S)
            sc = sc_ref[0, pl.ds(sub * 8 * tF, 8 * tF)]
            z = jnp.concatenate([zi.astype(jnp.float32) for zi in zs],
                                axis=1)
            y = y + sc[None, :] * z
        y_acc.append(y)

    @pl.when(g == nrep - 1)
    def _():
        for sub in range(nsub):
            y_ref[:, pl.ds(sub * 8 * tF, 8 * tF)] = y_acc[sub]


def run_variant(name, kernel, pk, cf, x, B, R, K, csz, nsub, nacc,
                extra, reps=6, chain=16, nrep=1, interpret=False):
    NC = K // csz

    def once(x, pk, cf):
        return pl.pallas_call(
            functools.partial(kernel, B=B, R=R, K=K, csz=csz, nsub=nsub,
                              nrep=nrep, **extra),
            grid=(nrep,),
            in_specs=[
                pl.BlockSpec((B, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                # whole packed matrix, constant map (fetched once): the
                # per-rep time is then pure DECODE COST + step floor —
                # exactly the number needed to compare against the ~7us
                # DMA budget the megastep would hide it under
                pl.BlockSpec((pk.shape[0], K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(cf.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, R), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, R), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((B, nacc), jnp.int32),
                pltpu.VMEM((B, 128), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=112 * 1024 * 1024),
            interpret=interpret,
        )(x, pk, cf)

    @jax.jit
    def go(x, pk, cf):
        def body(c, _):
            return c + once(x, pk, cf)[:, :128], None
        acc, _ = jax.lax.scan(body, jnp.zeros((B, 128), jnp.float32),
                              None, length=chain)
        return acc

    y = once(x, pk, cf)
    np.asarray(go(x, pk, cf))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(go(x, pk, cf))
        best = min(best, time.perf_counter() - t0)
    per = best / chain / nrep
    streamed = pk.size + cf.size * 4
    print(f"{name:8s}: {per * 1e6:8.1f} us/matmul   "
          f"{streamed / per / 1e9:7.1f} GB/s effective "
          f"({streamed / 1e6:.2f} MB streamed, nrep={nrep})", flush=True)
    return y, per


def main(interpret=False):
    rng = np.random.default_rng(0)
    B, R, K = 8, 3072, 3072
    # full-K chunks: one ~3.6 MB fetch per sequential grid step, so the
    # ~5.5us/step floor stays below the DMA time and decode-cost deltas
    # between the variants become resolvable
    csz, nsub = 3072, 3           # sub-tiles of 1024 rows (tF = 128)
    codes = rng.integers(0, 8, size=(R, K)).astype(np.int64)
    lut = np.sort(rng.normal(size=(R, 8)).astype(np.float32), axis=1)
    x = jnp.asarray(rng.integers(-127, 128, size=(B, K)), jnp.int8)

    # walsh operands (tile-major pack at the kernel's sub-tile size)
    pk_w = jnp.asarray(walsh_pack(codes, R // nsub))  # [3R/8, K]
    cf = walsh_coef(lut)                              # [8, R]
    W = lut[np.arange(R)[:, None], codes]             # dequant oracle
    y_ref = (np.asarray(x, np.float32) @ W.T)

    nrep = 1 if interpret else 128   # ~116 MB streamed: floor amortized
    for nmono, name in ((7, "walsh7"), (5, "walsh5"), (3, "walsh3")):
        nacc = nsub * nmono * 8 * (R // 8 // nsub)
        y, _ = run_variant(name, _kernel_walsh, pk_w, cf, x, B, R, K,
                           csz, nsub, nacc, {"nmono": nmono}, nrep=nrep,
                           interpret=interpret)
        if nmono == 7 and nrep == 1:   # exact-LUT parity at single pass
            err = np.max(np.abs(np.asarray(y) - y_ref)
                         / (np.abs(y_ref) + 1e3))
            print(f"  walsh7 exact-LUT parity: max rel err {err:.2e}",
                  flush=True)
            assert err < 1e-5, "walsh7 decode is not exact!"

    # uniform bits=3 baseline, same harness
    scales = np.abs(rng.normal(size=(1, R)).astype(np.float32)) + 0.1
    pk_u = jnp.asarray(np.asarray(_plane_pack(codes, R // nsub, 3)))
    sc = jnp.asarray(scales)
    metas, coef3, nd, _ = _plan_meta(3)
    nacc = nsub * nd * (R // 8 // nsub)
    y_u, _ = run_variant("w3", _kernel_w3, pk_u, sc, x, B, R, K, csz,
                         nsub, nacc, {}, nrep=nrep, interpret=interpret)
    if nrep == 1:
        Wu = scales.T * (codes - 4.0)
        y_uref = np.asarray(x, np.float32) @ Wu.T
        err = np.max(np.abs(np.asarray(y_u) - y_uref)
                     / (np.abs(y_uref) + 1e3))
        print(f"  w3 uniform parity: max rel err {err:.2e}", flush=True)


if __name__ == "__main__":
    import sys
    main(interpret="--interpret" in sys.argv)
