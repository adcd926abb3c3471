"""AutoRound-equivalent solver: signed-gradient rounding optimization (JAX).

The reference delegates QUANT_METHOD.AUTO_ROUND to the external ``auto-round``
package (``gptqmodel/models/base.py:638-707``, config knobs
``gptqmodel/quantization/config.py:511-570``) and packs its per-module
scale/zp into the uniform GPTQ format. This is the TPU-native equivalent,
implemented from the method itself (SignRound, arXiv 2309.05516): learn a
per-weight rounding perturbation ``v in [-0.5, 0.5]`` and per-group min/max
range multipliers ``alpha/beta`` by *signed* gradient descent through a
straight-through estimator of ``round()``.

Design differences from the reference (deliberate, TPU-first):

- **Objective**: the external package minimizes the block-output MSE
  ``||W_q X - W X||^2`` by re-running forwards over calibration batches. For
  a single linear that objective equals ``tr(E H E^T)`` with
  ``E = W_q - W`` and ``H = 2/n sum X X^T`` — the Hessian the looper already
  accumulates. We optimize that closed form directly: no activation replay,
  one fused ``E @ H`` matmul per step on the MXU, and the whole optimization
  is a single jitted ``lax.fori_loop``.
- **enable_quanted_input=True semantics come for free**: the looper feeds
  each layer the quantized previous layers' outputs (looper.py re-forward),
  exactly like the reference default.
- The artifact is the standard uniform format (qidx/scale/zero/g_idx), so
  packing, serving kernels, and ecosystem export are shared with GPTQ.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import QuantizeConfig
from .gptq import GPTQResult


def _round_ste(x: jax.Array) -> jax.Array:
    """round() with a straight-through gradient."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def _qdq(Wg, V, alpha, beta, *, maxq: int, sym: bool):
    """Differentiable group fake-quant.

    Wg: [m, G, gs] grouped weight; V: same shape, rounding perturbation;
    alpha/beta: [m, G] min/max range multipliers. Returns (Wq, scale, zero, q)
    with scale/zero per [m, G] and q the integer-valued codes.

    Range construction mirrors ``quantizer.find_params`` (min/max clamped
    through 0, sym mirroring, reference quantizer.py:79-128) so that
    alpha=beta=1, V=0 reproduces plain RTN with the same grid.
    """
    wmin = jnp.minimum(jnp.min(Wg, axis=-1), 0.0) * alpha
    wmax = jnp.maximum(jnp.max(Wg, axis=-1), 0.0) * beta
    if sym:
        wmax = jnp.maximum(jnp.abs(wmin), wmax)
        wmin = jnp.where(wmin < 0, -wmax, wmin)
    scale = jnp.maximum((wmax - wmin) / maxq, 1e-9)
    if sym:
        zero = jnp.full_like(scale, (maxq + 1) / 2)
    else:
        # clamp into the representable grid: minmax tuning can push the
        # range past zero, and a zero outside [0, maxq] would wrap in the
        # packed uint bitfield at export (formats/gptq_compat.pack_gptq)
        zero = jnp.clip(_round_ste(-wmin / scale), 0, maxq)
    v = jnp.clip(V, -0.5, 0.5)
    q = jnp.clip(_round_ste(Wg / scale[..., None] + v) + zero[..., None], 0, maxq)
    return scale[..., None] * (q - zero[..., None]), scale, zero, q


@partial(jax.jit, static_argnames=("maxq", "sym", "n", "iters", "minmax_tuning",
                                   "keep_best"))
def _autoround_core(Wg, H, *, maxq: int, sym: bool, n: int, iters: int,
                    lr: float, minmax_lr: float, minmax_tuning: bool,
                    keep_best: bool):
    """Signed-gradient descent on tr(E H E^T) over (V, alpha, beta).

    Wg: [m, G, gs] grouped (zero-padded past column n) weight, fp32.
    Returns the best-loss (V, alpha, beta) and its loss.
    """
    m, G, gs = Wg.shape

    def loss_fn(V, alpha, beta):
        Wq, _, _, _ = _qdq(Wg, V, alpha, beta, maxq=maxq, sym=sym)
        E = (Wq - Wg).reshape(m, G * gs)[:, :n]
        EH = jax.lax.dot_general(E, H, (((1,), (0,)), ((), ())),
                                 precision=jax.lax.Precision.HIGHEST)
        return jnp.sum(EH * E)

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))

    V0 = jnp.zeros_like(Wg)
    a0 = jnp.ones((m, G), jnp.float32)
    b0 = jnp.ones((m, G), jnp.float32)
    # momentum buffers (SignSGD with momentum 0.9, linear lr decay — the
    # external package's optimizer schedule)
    mV = jnp.zeros_like(V0)
    ma = jnp.zeros_like(a0)
    mb = jnp.zeros_like(b0)
    best = (V0, a0, b0)
    best_loss = loss_fn(V0, a0, b0)

    def step(i, carry):
        V, a, b, mV, ma, mb, best, best_loss = carry
        loss, (gV, ga, gb) = grad_fn(V, a, b)
        if keep_best:
            # snapshot the CURRENT params with THEIR loss before updating —
            # pairing post-update params with the pre-update loss would
            # return params the selection never evaluated
            better = loss < best_loss
            best = jax.tree.map(
                lambda new, old: jnp.where(better, new, old), (V, a, b), best)
            best_loss = jnp.minimum(loss, best_loss)
        decay = 1.0 - i / iters
        mV = 0.9 * mV + jnp.sign(gV)
        V = jnp.clip(V - lr * decay * mV, -0.5, 0.5)
        if minmax_tuning:
            ma = 0.9 * ma + jnp.sign(ga)
            mb = 0.9 * mb + jnp.sign(gb)
            # keep the range multipliers positive (a collapsed/negative
            # range degenerates the grid and the zero-point)
            a = jnp.clip(a - minmax_lr * decay * ma, 1e-3, 4.0)
            b = jnp.clip(b - minmax_lr * decay * mb, 1e-3, 4.0)
        return V, a, b, mV, ma, mb, best, best_loss

    V, a, b, mV, ma, mb, best, best_loss = jax.lax.fori_loop(
        0, iters, step, (V0, a0, b0, mV, ma, mb, best, best_loss))
    final_loss = loss_fn(V, a, b)
    if keep_best:
        better = final_loss < best_loss
        best = jax.tree.map(
            lambda new, old: jnp.where(better, new, old), (V, a, b), best)
        best_loss = jnp.minimum(final_loss, best_loss)
    else:
        best, best_loss = (V, a, b), final_loss
    return best, best_loss


def autoround_lrs(qcfg: QuantizeConfig):
    """(iters, lr, minmax_lr) with the package defaults (lr = 1/iters)."""
    iters = max(int(qcfg.autoround_iters), 1)
    lr = qcfg.autoround_lr if qcfg.autoround_lr else 1.0 / iters
    minmax_lr = qcfg.autoround_minmax_lr if qcfg.autoround_minmax_lr else lr
    return iters, float(lr), float(minmax_lr)


def autoround_quantize(W: jax.Array, H: jax.Array, qcfg: QuantizeConfig,
                       nsamples: int) -> GPTQResult:
    """Full AutoRound pipeline for one linear. Artifact = uniform GPTQ format.

    Dead (never-activated) input columns are repaired exactly like the GPTQ
    preamble (reference gptq.py:269-276); there is no activation ordering or
    Cholesky — the method has no sequential error compensation.
    """
    from .preamble import repair_dead

    W = W.astype(jnp.float32)
    H = H.astype(jnp.float32)
    m, n = W.shape
    maxq = 2 ** qcfg.bits - 1
    W, H, _ = repair_dead(W, H, qcfg.dead)

    gs = min(qcfg.group_size, n) if qcfg.group_size != -1 else n
    G = -(-n // gs)
    pad = G * gs - n
    # zero-padding the overhang is exact: min/max clamp through 0 and the
    # padded columns are excluded from the loss
    Wg = jnp.pad(W, ((0, 0), (0, pad))).reshape(m, G, gs)

    iters, lr, minmax_lr = autoround_lrs(qcfg)

    (V, alpha, beta), loss = _autoround_core(
        Wg, H, maxq=maxq, sym=qcfg.sym, n=n, iters=iters,
        lr=float(lr), minmax_lr=float(minmax_lr),
        minmax_tuning=bool(qcfg.autoround_minmax_tuning),
        keep_best=bool(qcfg.autoround_keep_best))

    Wq, scale, zero, q = _qdq(Wg, V, alpha, beta, maxq=maxq, sym=qcfg.sym)
    # (zero is exactly integer-valued already: sym uses (maxq+1)/2 and the
    # asym STE round is exact in fp32)

    Q = Wq.reshape(m, G * gs)[:, :n]
    qidx = q.reshape(m, G * gs)[:, :n].astype(jnp.int32)
    g_idx = jnp.asarray(np.arange(n) // gs, dtype=jnp.int32)

    avg_loss = float(loss) / max(nsamples, 1)
    if np.isnan(avg_loss):
        raise FloatingPointError(
            "AutoRound: NaN loss — check calibration data / lr.")

    return GPTQResult(Q=Q, scale=scale, zero=zero, g_idx=g_idx,
                      avg_loss=avg_loss, damp_used=0.0, nsamples=nsamples,
                      qidx=qidx)


__all__ = ["autoround_quantize", "autoround_lrs"]
