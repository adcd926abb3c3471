"""Fused MoE expert-MLP decode kernel: ONE pallas call per MoE layer,
streaming ONLY the routed experts' packed weights (VERDICT r4 #5).

The per-layer MoE fallback pays ~7+ kernel executions per layer per step
(the measured ~0.4 ms per-execution floor of this runtime makes that the
dominant decode cost for MoE models — PERF.md r4), and the stacked-expert
einsum form streams ALL E experts' weights every step. This kernel fixes
both, the TPU way:

- **Routing steers DMA through scalar prefetch.** Expert choice is data-
  dependent, which a pallas BlockSpec cannot read from kernel-computed
  values — but the router runs as plain XLA *between* kernels, and its
  top-k indices feed the NEXT pallas call's scalar-prefetch operand. The
  grid walks S = min(E, B*topk) expert slots; each slot's BlockSpec index
  map reads ``slot_ids[s]`` and fetches that expert's gate/up/down tiles.
  Slots are the top-S experts by total routed mass across the batch —
  a superset of every token's selection (distinct selected experts
  <= B*topk), so padded slots carry zero weight and the DMA cost is the
  UNION of routed experts, not all E. (The reference reaches the same
  end on GPU because its kernel boundary is the per-expert Linear,
  launched after routing — gptqmodel/utils/importer.py:45-58.)
- **Weights stream packed** at bits/8 bytes per weight with the same
  field-plane MXU dequant algebra as the megastep family
  (ops/megastep_lowbit).

Layer math (per slot e, matching models/transformer._moe_combine):
  a = act(x8 . gate_e) * (x8 . up_e);  y += w[:, e] * (a8 . down_e)
with the same activation-quantization points as the fused MLP phase of
the megasteps (per-row x8, per-tile a8).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .megastep4 import _quant_rows
from .megastep_lowbit import _derive, _mlp_plan, _plan_meta, _plane_pack, _recover

_DEF = jax.lax.Precision.DEFAULT


def _moe_kernel(sid_ref, x_ref, w_ref, gw_ref, uw_ref, gus_ref,
                dw_ref, ds_ref, y_ref, x8_s, sx_s, a8_s, acc_s,
                *, B: int, H: int, I: int, ti: int, gs: int, S: int,
                NG: int, bits: int, act: str):
    metas, coef, nd, g_r = _plan_meta(bits)
    tFi, tFo = ti // g_r, H // g_r
    t = pl.program_id(0)
    s_idx = t // NG                       # expert slot
    Gh = H // gs
    gti = ti // gs

    @pl.when(t == 0)
    def _():
        x8, sx = _quant_rows(x_ref[:].astype(jnp.float32))
        x8_s[:] = x8
        sx_s[:, :] = sx * jnp.ones((1, 128), jnp.float32)
        acc_s[:] = jnp.zeros_like(acc_s)

    def group_dot(xs, blocks_tFs):
        rhs = jnp.concatenate(
            [m for bg, tF in blocks_tFs for m in _derive(bg, tF, metas)],
            axis=0)
        dd = jax.lax.dot_general(xs, rhs, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.int32,
                                 precision=_DEF)
        Sx = jnp.sum(xs.astype(jnp.int32), axis=1, keepdims=True)
        return dd, Sx

    def fields_y(dd, Sx, tF, sc_row, off=0):
        zs = _recover(dd, tF, metas, coef, Sx, off)
        parts = []
        for f in range(g_r):
            sl = sc_row[:, f * tF:(f + 1) * tF].astype(jnp.float32)
            parts.append(sl * zs[f].astype(jnp.float32))
        return jnp.concatenate(parts, axis=1)

    # ---- gate/up plane dots over H groups -> act -> a8 -> down -> acc
    gv = jnp.zeros((B, ti), jnp.float32)
    uv = jnp.zeros((B, ti), jnp.float32)
    for g in range(Gh):
        xs = x8_s[:, g * gs:(g + 1) * gs]
        gbg = gw_ref[0, :, g * gs:(g + 1) * gs]
        ubg = uw_ref[0, :, g * gs:(g + 1) * gs]
        dd, Sx = group_dot(xs, [(gbg, tFi), (ubg, tFi)])
        gv = gv + fields_y(dd, Sx, tFi, gus_ref[0, g:g + 1, :ti])
        uv = uv + fields_y(dd, Sx, tFi, gus_ref[0, g:g + 1, ti:], off=nd)
    gv = gv * sx_s[:, :1]
    uv = uv * sx_s[:, :1]
    if act == "silu":
        a = jax.nn.silu(gv) * uv
    elif act == "gelu_tanh":
        a = jax.nn.gelu(gv, approximate=True) * uv
    else:
        a = jax.nn.gelu(gv, approximate=False) * uv
    a8, sa = _quant_rows(a)
    a8_s[:, :ti] = a8

    # per-(token, slot) routing weight: lane-select the slot column
    lane = jax.lax.broadcasted_iota(jnp.int32, w_ref.shape, 1)
    wt = jnp.sum(jnp.where(lane == s_idx, w_ref[:], 0.0), axis=1,
                 keepdims=True)                       # [B, 1]

    y = jnp.zeros((B, H), jnp.float32)
    for g2 in range(gti):
        xs = a8_s[:, g2 * gs:(g2 + 1) * gs]
        bg = dw_ref[0, :, g2 * gs:(g2 + 1) * gs]
        dd, Sx = group_dot(xs, [(bg, tFo)])
        y = y + fields_y(dd, Sx, tFo, ds_ref[0, g2:g2 + 1, :])
    acc_s[:] += y * sa * wt

    @pl.when(t == S * NG - 1)
    def _():
        y_ref[:] = acc_s[:].astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bits", "act", "interpret"))
def moe_expert_decode(x: jax.Array, mp: Dict[str, jax.Array],
                      slot_ids: jax.Array, wts: jax.Array, *,
                      bits: int = 4, act: str = "silu",
                      interpret: bool = False) -> jax.Array:
    """One MoE layer's routed-expert MLP for decode-shaped x.

    x [B, H]; ``mp`` from :func:`moe_megapack`; ``slot_ids`` [S] int32
    expert index per slot (repeats allowed — padded slots must carry zero
    weight); ``wts`` [B, S] f32 routing weights in slot order (0 for
    unrouted). Returns y [B, H] f32 = sum_slots wts * expert_mlp(x)."""
    B, H = x.shape
    metas, coef, nd, g_r = _plan_meta(bits)
    npl = len(metas)
    E = mp["gate_pk"].shape[0]
    # gate_pk stacks gate tiles [0, NG) and up tiles [NG, 2NG) row-wise
    I = mp["gate_pk"].shape[1] * g_r // npl // 2
    S = slot_ids.shape[0]
    ti, _ = _mlp_plan(I, bits, H)
    NG = I // ti
    gs = H // mp["gu_s"].shape[1]
    gti = ti // gs
    gtp8 = -(-gti // 8) * 8
    pi = npl * ti // g_r
    po = npl * H // g_r
    Sp = -(-S // 128) * 128
    wts_p = jnp.pad(jnp.asarray(wts, jnp.float32), ((0, 0), (0, Sp - S)))
    Bp = -(-B // 8) * 8
    if Bp != B:
        x = jnp.pad(x, ((0, Bp - B), (0, 0)))
        wts_p = jnp.pad(wts_p, ((0, Bp - B), (0, 0)))

    def e_of(t, s):
        return s[t // NG]

    def gi(t, s):
        return t % NG

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S * NG,),
        in_specs=[
            pl.BlockSpec((Bp, H), lambda t, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, Sp), lambda t, s: (0, 0),
                         memory_space=pltpu.VMEM),
            # expert gate/up tiles: slot-steered leading index (the
            # routing-as-prefetch trick), tile-walked trailing index
            pl.BlockSpec((1, pi, H), lambda t, s: (e_of(t, s), gi(t, s), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pi, H),
                         lambda t, s: (e_of(t, s), gi(t, s) + NG, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H // gs, 2 * ti),
                         lambda t, s: (e_of(t, s), 0, gi(t, s)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, po, ti),
                         lambda t, s: (e_of(t, s), 0, gi(t, s)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gtp8, H),
                         lambda t, s: (e_of(t, s), gi(t, s), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bp, H), lambda t, s: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Bp, H), jnp.int8),
            pltpu.VMEM((Bp, 128), jnp.float32),
            pltpu.VMEM((Bp, ti), jnp.int8),
            pltpu.VMEM((Bp, H), jnp.float32),
        ],
    )
    y = pl.pallas_call(
        functools.partial(_moe_kernel, B=Bp, H=H, I=I, ti=ti, gs=gs, S=S,
                          NG=NG, bits=bits, act=act),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, H), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(slot_ids, jnp.int32), x, wts_p,
      mp["gate_pk"], mp["gate_pk"], mp["gu_s"], mp["dn_pk"], mp["dn_s"])
    return y[:B]


def moe_megapack(cfg, moe: Dict[str, Any], bits: int) -> Dict[str, jax.Array]:
    """Plane-packed per-expert operands for :func:`moe_expert_decode` from
    a layer's ``moe["experts"]`` list of uniform-quantized gate/up/down
    QLinears. Pure jnp (jit at optimize()/prepack time)."""
    from .packing import unpack_int_rows

    H = cfg.hidden_size
    experts = moe["experts"]
    E = len(experts)
    I = experts[0]["gate"].out_features
    metas, coef, nd, g_r = _plan_meta(bits)
    ti, _ = _mlp_plan(I, bits, H)
    gs_w = H // experts[0]["gate"]["scales"].shape[-1]

    def pack_one(m, tile):
        codes = unpack_int_rows(m["qweight"], bits, m.in_features)
        return _plane_pack(codes, tile, bits)

    gate_pk, dn_pk, gu_s, dn_s = [], [], [], []
    gti = ti // gs_w
    gtp8 = -(-gti // 8) * 8
    NG = I // ti
    for e in experts:
        # gate and up tiles interleave on the NG axis of ONE array so a
        # single slot-steered BlockSpec serves both (up at index + NG)
        gp = pack_one(e["gate"], ti)
        up = pack_one(e["up"], ti)
        gate_pk.append(jnp.concatenate([gp, up], axis=0))
        dn_pk.append(pack_one(e["down"], H))
        gsc = jnp.swapaxes(e["gate"]["scales"].astype(jnp.bfloat16), 0, 1)
        usc = jnp.swapaxes(e["up"]["scales"].astype(jnp.bfloat16), 0, 1)
        # [G, 2I] tile-interleaved [gate_t | up_t]: the kernel slices
        # [:ti]/[ti:] of each gi-indexed last-axis block
        gu_s.append(jnp.concatenate(
            [jnp.concatenate([gsc[:, t * ti:(t + 1) * ti],
                              usc[:, t * ti:(t + 1) * ti]], axis=1)
             for t in range(NG)], axis=1))
        dsc = jnp.swapaxes(e["down"]["scales"].astype(jnp.bfloat16), 0, 1)
        dsc = dsc.reshape(NG, gti, H)
        if gtp8 != gti:
            dsc = jnp.pad(dsc, ((0, 0), (0, gtp8 - gti), (0, 0)))
        dn_s.append(dsc.reshape(NG * gtp8, H))
    return {
        "gate_pk": jnp.stack(gate_pk),       # [E, npl*2I/g_r, H]
        "gu_s": jnp.stack(gu_s),             # [E, G, 2I] tile-interleaved
        "dn_pk": jnp.stack(dn_pk),           # [E, npl*H/g_r, I]
        "dn_s": jnp.stack(dn_s),             # [E, NG*gtp8, H]
    }


def moe_mega_fusable(cfg, moe: Dict[str, Any], bits: int) -> bool:
    """Gate: per-expert uniform sym artifacts at ``bits`` with sequential
    128-multiple groups and plane-aligned tiles; topk routing."""
    experts = moe.get("experts")
    if not experts:
        return False
    metas, coef, nd, g_r = _plan_meta(bits) if bits in (2, 3, 4, 8) else (
        None, None, None, None)
    if metas is None:
        return False
    H = cfg.hidden_size
    if H % (g_r * 128):
        return False
    I = None
    for e in experts:
        for k in ("gate", "up", "down"):
            m = e.get(k)
            if m is None or getattr(m, "kind", None) != "uniform" \
                    or m.bits != bits:
                return False
            if any(x in m.arrays for x in ("zeros", "g_idx", "lora_a",
                                           "bias")):
                return False
            gs = m.in_features // m["scales"].shape[-1]
            if gs % 128 or m.in_features % gs:
                return False
        Ie = e["gate"].out_features
        if I is None:
            I = Ie
        elif I != Ie:
            return False
        if e["up"].out_features != Ie or e["down"].in_features != Ie:
            return False
        if I % (g_r * 128):
            return False
    if cfg.moe_router_mode != "topk":
        return False
    if _mlp_plan(I, bits, H)[0] is None:
        return False
    return (I // _mlp_plan(I, bits, H)[0]) >= 1


__all__ = ["moe_expert_decode", "moe_megapack", "moe_mega_fusable"]
