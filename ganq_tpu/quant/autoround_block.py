"""Block-scope AutoRound: jointly tune one decoder layer's rounding against
the LAYER output MSE.

This matches the external auto-round package's default granularity
(``nblocks=1`` — one transformer block per optimization unit,
``gptqmodel/models/base.py:681-699``): all of a layer's linears share one
signed-gradient optimization whose objective is
``|| layer(x; W_q) - layer(x; W) ||^2`` over calibration activations, so
cross-module interactions (q/k/v through attention, gate*up through the
activation) inform the rounding. The per-module scope
(``quant/autoround.py``) optimizes each linear against its own
Hessian-weighted error instead — cheaper, no layer replays.

TPU-shape: the layer forward is a pure function, so the whole objective is
differentiable end-to-end with STE rounding; one jitted SignSGD step per
calibration batch (the package's ``batch_size=1`` sampling), batches cycled
deterministically.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import QuantizeConfig
from ..models.transformer import ModelConfig, layer_forward
from .autoround import _qdq
from .gptq import GPTQResult


def _with_weights(lp: Dict[str, Any], repl: Dict[str, jax.Array]):
    """Functional copy of the layer pytree with slot weights replaced.
    Linears during quantization are dense QLinear pytrees."""
    from ..ops.qlinear import QLinear

    def setpath(node, parts, val):
        head = parts[0]
        out = dict(node)
        if len(parts) == 1:
            lin = out[head]
            arrays = dict(lin.arrays) if isinstance(lin, QLinear) else dict(lin)
            arrays["weight"] = val
            out[head] = (QLinear(lin.kind, arrays, lin.bits, lin.in_features)
                         if isinstance(lin, QLinear) else arrays)
        else:
            out[head] = setpath(out[head], parts[1:], val)
        return out

    out = lp
    for slot, w in repl.items():
        out = setpath(out, slot.split("."), w)
    return out


def _prep(W: jax.Array, eff: QuantizeConfig):
    m, n = W.shape
    gs = min(eff.group_size, n) if eff.group_size != -1 else n
    G = -(-n // gs)
    Wg = jnp.pad(W.astype(jnp.float32), ((0, 0), (0, G * gs - n))
                 ).reshape(m, G, gs)
    return Wg, dict(maxq=2 ** eff.bits - 1, sym=eff.sym, n=n, gs=gs)


def autoround_block_quantize(
    cfg: ModelConfig, lp: Dict[str, Any],
    todo: List[Tuple[str, str, QuantizeConfig]],
    acts, masks, ropes, window, qcfg: QuantizeConfig, nsamples: int,
) -> Tuple[Dict[str, jax.Array], Dict[str, GPTQResult], float]:
    """Returns ({slot: fake-quant weight}, {mod: GPTQResult}, final loss)."""
    Wgs, metas, slots = [], [], []
    for mod, slot, eff in todo:
        lin = lp
        for part in slot.split("."):
            lin = lin[part]
        Wg, meta = _prep(lin["weight"], eff)
        Wgs.append(Wg)
        metas.append(meta)
        slots.append(slot)

    from .autoround import autoround_lrs
    iters, lr, mmlr = autoround_lrs(qcfg)
    tune_mm = bool(qcfg.autoround_minmax_tuning)

    def fq_weight(i, V, a, b):
        Wq, _, _, _ = _qdq(Wgs[i], V, a, b, maxq=metas[i]["maxq"],
                           sym=metas[i]["sym"])
        m = Wq.shape[0]
        return Wq.reshape(m, -1)[:, :metas[i]["n"]]

    @partial(jax.jit, static_argnames=("wv",))
    def y_ref(x, mask, rope, wv=None):
        return layer_forward(cfg, lp, x, mask, rope, window=wv)[0]

    def loss_fn(Vs, As, Bs, x, mask, rope, y_fp, wv):
        repl = {slots[i]: fq_weight(i, Vs[i], As[i], Bs[i]).astype(
            jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32)
            for i in range(len(slots))}
        y = layer_forward(cfg, _with_weights(lp, repl), x, mask, rope,
                          window=wv)[0]
        d = (y.astype(jnp.float32) - y_fp.astype(jnp.float32))
        return jnp.mean(d * d)

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))

    nb_total = len(acts)

    @partial(jax.jit, static_argnames=("wv",))
    def step_fn(carry, i, bi, x, mask, rope, y_fp, wv=None):
        Vs, As, Bs, mVs, mAs, mBs, recent, best, best_loss = carry
        loss, (gV, gA, gB) = grad_fn(Vs, As, Bs, x, mask, rope, y_fp, wv)
        # best-tracking compares MEANS over one full batch cycle: per-batch
        # MSEs are not comparable (a small-magnitude batch would otherwise
        # freeze an early iterate as "best" forever)
        recent = recent.at[bi].set(loss)
        cycle = jnp.mean(recent)
        ready = i >= nb_total - 1
        better = ready & (cycle < best_loss)
        best = jax.tree.map(lambda new, old: jnp.where(better, new, old),
                            (Vs, As, Bs), best)
        best_loss = jnp.where(better, cycle, best_loss)
        decay = 1.0 - i / iters
        mVs = [0.9 * m + jnp.sign(g) for m, g in zip(mVs, gV)]
        Vs = [jnp.clip(V - lr * decay * m, -0.5, 0.5)
              for V, m in zip(Vs, mVs)]
        if tune_mm:
            mAs = [0.9 * m + jnp.sign(g) for m, g in zip(mAs, gA)]
            mBs = [0.9 * m + jnp.sign(g) for m, g in zip(mBs, gB)]
            As = [jnp.clip(a - mmlr * decay * m, 1e-3, 4.0)
                  for a, m in zip(As, mAs)]
            Bs = [jnp.clip(b - mmlr * decay * m, 1e-3, 4.0)
                  for b, m in zip(Bs, mBs)]
        return (Vs, As, Bs, mVs, mAs, mBs, recent, best, best_loss), loss

    Vs = [jnp.zeros_like(W) for W in Wgs]
    As = [jnp.ones(W.shape[:2], jnp.float32) for W in Wgs]
    Bs = [jnp.ones(W.shape[:2], jnp.float32) for W in Wgs]
    carry = (Vs, As, Bs,
             [jnp.zeros_like(v) for v in Vs],
             [jnp.zeros_like(a) for a in As],
             [jnp.zeros_like(b) for b in Bs],
             jnp.zeros((len(acts),), jnp.float32),
             (list(Vs), list(As), list(Bs)), jnp.float32(np.inf))

    y_fps = [y_ref(x, mask, rope, wv=window)
             for x, mask, rope in zip(acts, masks, ropes)]

    nb = len(acts)
    for it in range(iters):
        bi = it % nb  # deterministic batch cycling (the package samples)
        carry, loss = step_fn(carry, jnp.float32(it), bi, acts[bi],
                              masks[bi], ropes[bi], y_fps[bi], wv=window)
    (bV, bA, bB) = carry[7]
    best_loss = float(carry[8])

    new_weights: Dict[str, jax.Array] = {}
    results: Dict[str, GPTQResult] = {}
    for i, (mod, slot, eff) in enumerate(todo):
        meta = metas[i]
        Wq, scale, zero, q = _qdq(Wgs[i], bV[i], bA[i], bB[i],
                                  maxq=meta["maxq"], sym=meta["sym"])
        m, n = Wq.shape[0], meta["n"]
        Q = Wq.reshape(m, -1)[:, :n]
        results[mod] = GPTQResult(
            Q=Q, scale=scale, zero=zero,
            g_idx=jnp.asarray(np.arange(n) // meta["gs"], jnp.int32),
            avg_loss=best_loss, damp_used=0.0, nsamples=nsamples,
            qidx=q.reshape(m, -1)[:, :n].astype(jnp.int32))
        new_weights[slot] = Q
    return new_weights, results, best_loss


__all__ = ["autoround_block_quantize"]
