"""Stacked-layer serving path: ``lax.scan`` over layer parameters.

For deep models the per-layer unrolled program (serve/engine.py) compiles
O(depth) HLO; stacking homogeneous layer params with a leading layer axis and
scanning compiles one layer body regardless of depth — the right shape for
32-80 layer serving (and for this environment's slow remote compiles).

QLinear pytrees stack transparently: scan slices each array leaf's leading
dim and rebuilds the node with its static (kind, bits, in_features) aux.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..models.transformer import (ModelConfig, causal_mask, embed,
                                  layer_forward, rope_tables,
                                  rope_tables_all, unembed)


def fuse_layer(lp: Dict[str, Any]) -> Dict[str, Any]:
    """Serving-time fusion: q/k/v -> one qkv linear, gate/up -> gateup.
    Fewer, larger kernels — the dominant fixed-overhead win at decode."""
    from ..ops.qlinear import concat_rows

    out = dict(lp)
    a = lp["attn"]
    if all(a.get(k) is not None for k in ("q", "k", "v")):
        fused = {"qkv": concat_rows([a["q"], a["k"], a["v"]]), "o": a["o"]}
        for extra in ("q_norm", "k_norm"):  # qwen3/gemma3 norms ride along
            if extra in a:
                fused[extra] = a[extra]
        if (getattr(a["o"], "kind", None) == "w8"
                and "lora_a" not in a["o"].arrays
                and "bias" not in a["o"].arrays):
            # transposed o weight for the attention-half megakernel
            # (ops/fused_layer.py): [H, Dq] int8 -> [Dq, H], per-row scale
            # [H, 1] -> lane row [1, H]
            fused["o_t_w8"] = a["o"]["w8"].T
            fused["o_t_scale"] = a["o"]["scale"].reshape(1, -1)
        out["attn"] = fused
    m = lp.get("mlp")
    if m is not None and "gate" in m and "up" in m:
        out["mlp"] = {"gateup": concat_rows([m["gate"], m["up"]]),
                      "down": m["down"]}
    return out


def recode_layer_w8(lp: Dict[str, Any]) -> Dict[str, Any]:
    """Recode every LUT linear in a layer to the int8 fast path."""
    from ..ops.qlinear import QLinear, recode_w8

    def rec(x):
        return recode_w8(x) if isinstance(x, QLinear) else x

    return {
        k: ({kk: rec(vv) for kk, vv in v.items()} if isinstance(v, dict) else v)
        for k, v in lp.items()
    }


def recode_layer_affine(lp: Dict[str, Any]) -> Dict[str, Any]:
    """Certify grid-representable LUT linears to the uniform packed-4-bit
    fast path (ops/qlinear.certify_uniform); non-affine codebooks are left
    exact. GANQ_LUT_AFFINE=0 opts out."""
    from ..ops.qlinear import QLinear, certify_uniform

    def rec(x):
        if isinstance(x, QLinear):
            q = certify_uniform(x)
            if q is not None:
                return q
        return x

    return {
        k: ({kk: rec(vv) for kk, vv in v.items()} if isinstance(v, dict) else v)
        for k, v in lp.items()
    }


def stack_layers(params: Dict[str, Any], fuse: bool = True,
                 recode: str = "none") -> Dict[str, Any]:
    """Convert params["layers"] (list of per-layer pytrees with identical
    structure) into one stacked pytree with a leading layer axis.

    ``recode="w8"`` converts LUT linears to the int8 fast serving path;
    ``recode="affine"`` certifies grid-representable LUT codebooks to the
    uniform W4 fast path and leaves the rest exact."""
    layers = params["layers"]
    if recode == "affine" and os.environ.get("GANQ_LUT_AFFINE", "1") != "0":
        layers = [recode_layer_affine(lp) for lp in layers]
    if recode == "w8":
        layers = [recode_layer_w8(lp) for lp in layers]
    if fuse:
        layers = [fuse_layer(lp) for lp in layers]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    out = {k: v for k, v in params.items() if k != "layers"}
    out["layers_stacked"] = stacked
    out["num_layers"] = len(layers)
    return out


def _layer_windows(cfg: ModelConfig, max_seq: int):
    """Per-layer window sizes as scan data (None if no layer slides).
    Full-attention layers get window=max_seq — a no-op overlay — so the
    scanned layer body stays homogeneous across sliding/full layers."""
    if cfg.sliding_window is None:
        return None
    return jnp.asarray([cfg.layer_window(i) or max_seq
                        for i in range(cfg.num_hidden_layers)], jnp.int32)


def _rope_with_select(cfg: ModelConfig, positions):
    """(rope, per-layer selector). Dual-rope models (gemma3) return both
    tables plus a bool[L] riding the scan; the body where-selects — two
    tables total instead of L stacked ones."""
    if cfg.pos != "rope":
        return None, None
    rope = rope_tables_all(cfg, positions)
    if isinstance(rope, dict):
        sel = jnp.asarray([cfg.layer_window(i) is not None
                           for i in range(cfg.num_hidden_layers)])
        return rope, sel
    return rope, None


def _pick_rope(rope, sel):
    if not isinstance(rope, dict):
        return rope
    return jax.tree_util.tree_map(lambda a, b: jnp.where(sel, a, b),
                                  rope["local"], rope["global"])


@functools.partial(jax.jit, static_argnames=("cfg", "backend"))
def prefill(cfg: ModelConfig, sp: Dict[str, Any], cache_k, cache_v,
            input_ids: jax.Array, backend: str = "reference"):
    """cache_k/v: [L, B, T, Hkv, D]. Returns (last logits, cache_k, cache_v)."""
    b, s = input_ids.shape
    max_seq = cache_k.shape[2]
    positions = jnp.broadcast_to(jnp.arange(s), (b, s))
    x = embed(cfg, sp, input_ids, positions)
    mask = causal_mask(s, max_seq)
    rope, rsel = _rope_with_select(cfg, positions)

    windows = _layer_windows(cfg, max_seq)

    def body(x, layer):
        lp, ck, cv, win, sl = layer
        y, new_cache, _ = layer_forward(cfg, lp, x, mask, _pick_rope(rope, sl),
                                        cache={"k": ck, "v": cv}, cache_pos=0,
                                        backend=backend, window=win)
        return y, (new_cache["k"], new_cache["v"])

    x, (cache_k, cache_v) = jax.lax.scan(
        body, x, (sp["layers_stacked"], cache_k, cache_v, windows, rsel))
    logits = unembed(cfg, sp, x[:, -1:, :], backend)
    return logits[:, 0, :], cache_k, cache_v


def _decode_one(cfg, sp, cache_k, cache_v, token, pos, backend):
    b = token.shape[0]
    max_seq = cache_k.shape[2]
    positions = jnp.broadcast_to(pos, (b, 1))
    x = embed(cfg, sp, token[:, None], positions)
    mask = (jnp.arange(max_seq) <= pos)[None, None, None, :]
    rope, rsel = _rope_with_select(cfg, positions)

    windows = _layer_windows(cfg, max_seq)

    def body(x, layer):
        lp, ck, cv, win, sl = layer
        y, new_cache, _ = layer_forward(cfg, lp, x, mask, _pick_rope(rope, sl),
                                        cache={"k": ck, "v": cv},
                                        cache_pos=pos, backend=backend,
                                        window=win)
        return y, (new_cache["k"], new_cache["v"])

    x, (cache_k, cache_v) = jax.lax.scan(
        body, x, (sp["layers_stacked"], cache_k, cache_v, windows, rsel))
    logits = unembed(cfg, sp, x, backend)[:, 0, :]
    return logits, cache_k, cache_v


# ------------------------------------------------------------ megastep path
# plane-kernel variants -> packed bits (npl/g_r derive from _plan_meta).
# "wl8" = walsh LUT decode: TRUE per-row 8-entry codebooks (GANQ bits=3
# artifacts) at 3 bits/weight streamed — same 3-plane layout as w3, plus
# in-kernel XOR-derived interaction planes and Walsh coefficient rows.
_LB_BITS = {"w4p": 4, "w3": 3, "w2": 2, "w8p": 8, "wl8": 3}


def _lb_kv_dim(cfg, mp, bits: int) -> int:
    from ..ops.megastep_lowbit import _plan_meta
    metas, _, _, g_r = _plan_meta(bits)
    return (mp["qkv_pk"].shape[1] * g_r // len(metas) - cfg.q_dim) // 2


def mega_enabled(cfg: ModelConfig, sp, backend: str, batch: int):
    """Whole-decode-step megakernel gate: all layers in ONE pallas_call,
    weight-streaming at the HBM roofline. Returns "w4p" (uniform W4 on the
    plane kernel — multi-tile grid steps + trailing-unembed fold), "w4"
    (the original pair-nibble kernel, ops/megastep4.py; GANQ_W4_PLANE=0),
    "w3"/"w2" (plane-packed low-bit kernels, ops/megastep_lowbit.py), "w8"
    (int8 kernel, ops/megastep.py) or None. Default ON for the w8a8
    backend on eligible models; GANQ_MEGASTEP=0 disables, GANQ_MEGASTEP=1
    forces it on CPU (interpret mode, tests)."""
    if not mega_env_enabled(backend, batch):
        return None
    from ..ops.megastep import megastep_fusable
    from ..ops.megastep4 import megastep4_fusable
    from ..ops.megastep_lowbit import (megastep_lowbit_fusable,
                                       megastep_walsh_fusable)
    # TRUE non-uniform LUT serving (VERDICT r4 #1): per-row 8-entry
    # codebooks (GANQ bits=3, unconstrained accuracy) decode in-kernel
    # via the Walsh plane expansion at 3 bits/weight — checked first so
    # an 8-entry LUT checkpoint never falls back to the int8 recode.
    # GANQ_WALSH=0 opts out (the artifact then serves via recodes).
    if (os.environ.get("GANQ_WALSH", "1") != "0"
            and megastep_walsh_fusable(cfg, sp)):
        return "wl8"
    # the same uniform-W4 artifact can ride the plane kernel (bits=4 is
    # one plane of two nibble fields — the identical pair algebra) which
    # walks MULTIPLE packed tiles per sequential grid step (ptq/ptg),
    # cutting the ~5.5us/step floor, and additionally serves biased
    # projections. GANQ_W4_PLANE=0 falls back to the pair kernel
    # (ops/megastep4.py) where its narrower gate admits the model.
    if (os.environ.get("GANQ_W4_PLANE", "1") != "0"
            and megastep_lowbit_fusable(cfg, sp, 4)):
        return "w4p"
    if batch <= 8 and megastep4_fusable(cfg, sp):
        return "w4"
    if megastep_lowbit_fusable(cfg, sp, 3):
        return "w3"
    if megastep_lowbit_fusable(cfg, sp, 2):
        return "w2"
    # int8 serving, measured owners (round-5 A/B, PERF.md r5): at batch
    # <= 8 the per-row w8 megastep wins (1336.8 vs 1203.4 tok/s at the 3B
    # shape — the r4 gate order silently cost 10% on the default path,
    # VERDICT r4 weak #1), so w8-kind artifacts keep it; the w8p plane
    # kernel (one plane, one 8-bit field) owns batch 9..32, where the w8
    # kernel cannot go (prepack converts w8 -> uniform8 losslessly only
    # for batch > 8). Uniform bits=8 artifacts always ride w8p.
    if batch <= 8 and megastep_fusable(cfg, sp):
        return "w8"
    if megastep_lowbit_fusable(cfg, sp, 8):
        return "w8p"
    return None


def mega_env_enabled(backend: str, batch: int) -> bool:
    """The cheap env/backend/batch part of the megastep gate — callable
    BEFORE building a stacked copy of the model (it needs no params)."""
    env = os.environ.get("GANQ_MEGASTEP", "")
    # the plane kernels tile the per-head batch stride in octets (Bp),
    # so decode batches up to 64 ride the megastep (r5: raised from 32 —
    # the walsh exact-LUT decode is MXU-pad-bound and reclaims the pad
    # linearly in B; the VMEM estimator degrades Tb as the kv blocks
    # grow); the pair-nibble w4 / w8 kernels keep the original B <= 8 gate
    if env == "0" or batch > 64:
        return False
    # default-on only for the w8a8 backend on a real TPU; GANQ_MEGASTEP=1
    # forces the decode path under any backend (CPU tests run it in
    # interpret mode against a reference-backend prefill)
    if env != "1" and (backend != "pallas_a8"
                       or jax.default_backend() == "cpu"):
        return False
    return True


def certify_stacked(sp):
    """Certify grid-representable LUT linears in an ALREADY-STACKED pytree
    onto the uniform packed path (ops/qlinear.certify_uniform handles the
    leading layer axis; the packed code planes pass through zero-copy).
    GANQ ``ganq_codebook="affine"`` checkpoints then ride the megastep
    kernels at W4 bytes; free-codebook rows leave the pytree unchanged."""
    from ..ops.qlinear import QLinear, certify_uniform

    def rec(x):
        if isinstance(x, QLinear) and x.kind == "lut":
            q = certify_uniform(x)
            if q is not None:
                return q
        return x

    out = dict(sp)
    for key in ("layers_stacked", "lm_head"):
        if key in out:
            out[key] = jax.tree_util.tree_map(
                rec, out[key], is_leaf=lambda x: isinstance(x, QLinear))
    return out


def w8p_stacked(sp):
    """Losslessly convert per-row-scale w8 linears in an ALREADY-STACKED
    layer pytree to uniform bits=8 group-broadcast artifacts
    (ops/qlinear.w8_to_uniform8) so int8 recodes ride the plane megastep
    ("w8p": batch <= 32, trailing-unembed) instead of the batch <= 8
    per-row w8 kernel. The lm_head stays w8 — the trailing-unembed fold
    consumes that kind directly. GANQ_W8_PLANE=0 opts out."""
    from ..ops.qlinear import QLinear, w8_to_uniform8

    ls = sp.get("layers_stacked")
    if ls is None:
        return sp
    changed = [False]

    def rec(x):
        if isinstance(x, QLinear) and x.kind == "w8":
            q = w8_to_uniform8(x)
            changed[0] = changed[0] or q is not x
            return q
        return x

    ls2 = jax.tree_util.tree_map(
        rec, ls, is_leaf=lambda x: isinstance(x, QLinear))
    if not changed[0]:
        return sp
    # drop the w8-only transposed-o fast-path arrays (dead after conversion)
    if "attn" in ls2 and "o_t_w8" in ls2["attn"]:
        attn = {k: v for k, v in ls2["attn"].items()
                if k not in ("o_t_w8", "o_t_scale")}
        ls2 = dict(ls2)
        ls2["attn"] = attn
    out = dict(sp)
    out["layers_stacked"] = ls2
    return out


def prepack(cfg: ModelConfig, sp, backend: str, batch: int):
    """Pre-pack megakernel operands ONCE (outside jit) and attach them to
    the params pytree; greedy_decode picks them up instead of re-packing
    per call. No-op when the megastep path would not engage."""
    if os.environ.get("GANQ_LUT_AFFINE", "1") != "0":
        sp = certify_stacked(sp)
    if (mega_env_enabled(backend, batch) and batch > 8
            and os.environ.get("GANQ_W8_PLANE", "1") != "0"):
        # batch > 8 only: at batch <= 8 the per-row w8 megastep is the
        # measured owner (PERF.md r5 A/B) and needs kind=w8 artifacts
        sp = w8p_stacked(sp)
    variant = mega_enabled(cfg, sp, backend, batch)
    if variant == "w4" and "megapack4" not in sp:
        from ..ops.megastep4 import megapack4
        sp = dict(sp)
        # jitted: XLA fuses the int4 unpack into the pair re-pack, so the
        # multi-GB int32 code intermediates never materialize in HBM
        sp["megapack4"] = jax.jit(lambda t: megapack4(cfg, t))(sp)
    elif variant == "wl8" and "megapack_wl" not in sp:
        from ..ops.megastep_lowbit import megapack_walsh
        sp = dict(sp)
        sp["megapack_wl"] = dict(
            jax.jit(lambda t: megapack_walsh(cfg, t))(sp))
    elif variant in ("w4p", "w3", "w2") and "megapack_lb" not in sp:
        from ..ops.megastep_lowbit import actorder_transform, megapack_lowbit
        sp = dict(sp)
        bits = _LB_BITS[variant]
        # act-order artifacts: bake group-sorted columns into a pack-only
        # copy and carry the Beneš activation-routing masks in the mp
        # (ops/megastep_lowbit.actorder_transform). The ORIGINAL sp keeps
        # serving prefill and every non-mega path (g_idx intact there).
        tsp, ap_masks = actorder_transform(cfg, sp, bits)
        mp = dict(jax.jit(lambda t: megapack_lowbit(cfg, t, bits))(tsp))
        mp.update(ap_masks)
        sp["megapack_lb"] = mp
    elif variant == "w8" and "megapack_w8" not in sp:
        from ..ops.megastep import megapack
        sp = dict(sp)
        # the w8 megapack transposes the down projection (K-major) —
        # ~0.7 GB at 3B; packing per generate call would repeat it
        sp["megapack_w8"] = jax.jit(lambda t: megapack(cfg, t))(sp)
    return sp


def _mega_cache(cfg, cache_k, cache_v):
    """[L, B, T, Hkv, d] -> the megakernel's [L, B*Hkv, T, d] layout."""
    L, B, T, Hkv, d = cache_k.shape
    to = lambda c: c.transpose(0, 1, 3, 2, 4).reshape(L, B * Hkv, T, d)
    return to(cache_k), to(cache_v)


def _mega_rope_kw(cfg: ModelConfig, positions, b: int, L: int, T: int,
                  vec: bool = False):
    """(rd, cos_h, sin_h, extra_kw) for the lowbit megastep: dual-rope
    models (gemma3) get stacked [2, B, half] tables + a per-layer selector;
    sliding models get per-layer windows; softcap passes through."""
    from ..models.transformer import (_rope_half_tables,
                                      _rope_half_tables_vec)

    get = _rope_half_tables_vec if vec else _rope_half_tables
    rope = rope_tables_all(cfg, positions) if cfg.pos == "rope" else None
    kw = {}
    if isinstance(rope, dict):
        rd, cg, sg = get(cfg, rope["global"])
        _, cl, sl = get(cfg, rope["local"])

        def _b(t):
            t = jnp.asarray(t, jnp.float32)
            return t if t.ndim == 2 else jnp.broadcast_to(
                t[None], (b, t.shape[-1]))

        cos_h = jnp.stack([_b(cg), _b(cl)])
        sin_h = jnp.stack([_b(sg), _b(sl)])
        kw["rope_sel"] = jnp.asarray(
            [1 if cfg.layer_window(i) is not None else 0
             for i in range(L)], jnp.int32)
    elif rope is not None:
        rd, cos_h, sin_h = get(cfg, rope)
    else:
        rd, cos_h, sin_h = 0, None, None
    if cfg.sliding_window is not None:
        kw["windows"] = jnp.asarray(
            [cfg.layer_window(i) or T for i in range(L)], jnp.int32)
    if cfg.attn_softcap is not None:
        kw["softcap"] = float(cfg.attn_softcap)
    return rd, cos_h, sin_h, kw


def _decode_one_mega(cfg: ModelConfig, sp, mp, ck, cv, token, pos,
                     variant: str = "w8"):
    """One decode step through the megakernel. ck/cv in mega layout;
    returns (logits, ck, cv)."""
    from ..ops.megastep import megastep_decode_w8a8
    from ..ops.megastep4 import megastep4_decode
    from ..ops.megastep_lowbit import megastep_lowbit_decode
    from ..models.transformer import _fused_act_kind, _rope_half_tables

    b = token.shape[0]
    L = ck.shape[0]
    d = cfg.head_dim
    if variant == "w4":
        kv_dim = (mp["qkv_p4"].shape[1] * 2 - cfg.q_dim) // 2
    elif variant in _LB_BITS:
        kv_dim = _lb_kv_dim(cfg, mp, _LB_BITS[variant])
    else:
        kv_dim = (mp["qkv_w8"].shape[1] - cfg.q_dim) // 2
    positions = jnp.broadcast_to(pos, (b, 1))
    x = embed(cfg, sp, token[:, None], positions)[:, 0, :]
    if variant in _LB_BITS:
        rd, cos_h, sin_h, lb_kw = _mega_rope_kw(cfg, positions, b, L,
                                                ck.shape[2])
    else:
        rd, cos_h, sin_h = _rope_half_tables(cfg, rope_tables(cfg, positions))
        lb_kw = {}
    scale = (cfg.attn_scale if cfg.attn_scale is not None
             else 1.0 / math.sqrt(d))
    kw = {}
    logits = None
    if variant == "w4":
        step_fn = megastep4_decode
    elif variant in _LB_BITS:
        from ..ops.megastep_lowbit import mega_lm_operands
        step_fn = megastep_lowbit_decode
        kw["bits"] = _LB_BITS[variant]
        if variant == "wl8":
            kw["walsh"] = 7          # exact 8-DOF codebook decode
        kw.update(lb_kw)
        # trailing-unembed fold: int8-quantizes the final activations before
        # the lm_head dot (the non-mega path keeps unembed activations in
        # full precision — models/transformer.py unembed). The logits
        # perturbation is bounded by the per-row a8 step and is covered by
        # the fold-vs-unembed comparison test (tests/test_megastep_lowbit),
        # but GANQ_LM_FOLD=0 opts out, mirroring GANQ_W4_PLANE.
        if os.environ.get("GANQ_LM_FOLD", "1") != "0":
            lm_ops = mega_lm_operands(cfg, sp)
            if lm_ops is not None:
                kw["lm"] = lm_ops
    else:
        step_fn = megastep_decode_w8a8
    out = step_fn(
        x, mp, ck, cv, pos, cos_h, sin_h,
        q_dim=cfg.q_dim, kv_dim=kv_dim, head_dim=d, rotary_dim=rd,
        interleaved=cfg.rope_interleaved, eps=cfg.norm_eps,
        rms_offset=cfg.rms_offset, scale=scale, act=_fused_act_kind(cfg),
        interpret=jax.default_backend() == "cpu", **kw)
    if len(out) == 4:                       # trailing-unembed fold engaged
        y, kn, vn, logits = out
        logits = _fold_logit_epilogue(cfg, logits)
    else:
        y, kn, vn = out
    kn4 = kn.reshape(L, b * (kv_dim // d), 1, d).astype(ck.dtype)
    vn4 = vn.reshape(L, b * (kv_dim // d), 1, d).astype(cv.dtype)
    ck = jax.lax.dynamic_update_slice(ck, kn4, (0, 0, pos, 0))
    cv = jax.lax.dynamic_update_slice(cv, vn4, (0, 0, pos, 0))
    if logits is None:
        logits = unembed(cfg, sp, y[:, None, :], "pallas" if jax.default_backend() != "cpu" else "reference")[:, 0, :]
    return logits, ck, cv


def _fold_logit_epilogue(cfg: ModelConfig, logits):
    """logit_scale / softcap on folded-unembed logits — the tail of
    models/transformer.unembed that stays OUTSIDE the megakernel."""
    if cfg.logit_scale is not None:
        logits = logits * jnp.asarray(cfg.logit_scale, logits.dtype)
    if cfg.logit_softcap is not None:
        cap = cfg.logit_softcap
        logits = cap * jnp.tanh(logits / cap)
    return logits


def _mega_pack_for(cfg, sp, variant: str):
    """The prepacked megakernel operands for ``variant`` (packing inline
    under jit when prepack() was not called)."""
    if variant == "w4":
        from ..ops.megastep4 import megapack4
        mp = sp.get("megapack4")
        return mp if mp is not None else megapack4(cfg, sp)
    if variant == "wl8":
        from ..ops.megastep_lowbit import megapack_walsh
        mp = sp.get("megapack_wl")
        return mp if mp is not None else megapack_walsh(cfg, sp)
    if variant in _LB_BITS:
        from ..ops.megastep_lowbit import megapack_lowbit
        mp = sp.get("megapack_lb")
        return mp if mp is not None else megapack_lowbit(
            cfg, sp, _LB_BITS[variant])
    from ..ops.megastep import megapack
    mp = sp.get("megapack_w8")
    return mp if mp is not None else megapack(cfg, sp)


def greedy_decode(cfg: ModelConfig, sp, cache_k, cache_v, input_ids,
                  steps: int, backend: str = "reference"):
    """Prefill + ``steps`` greedy decode steps as one compiled program.
    Returns generated tokens [B, steps]. Host-level entry point: the
    megastep variant is resolved HERE (eagerly) and passed as a static
    jit argument — resolving it inside the jitted body would bake the
    GANQ_MEGASTEP env read into the trace and make later env toggles
    silently hit the stale cache entry."""
    variant = mega_enabled(cfg, sp, backend, input_ids.shape[0])
    return _greedy_decode_impl(cfg, sp, cache_k, cache_v, input_ids,
                               steps, backend, variant)


@functools.partial(jax.jit, static_argnames=("cfg", "backend", "steps",
                                             "variant"),
                   donate_argnums=(2, 3))
def _greedy_decode_impl(cfg: ModelConfig, sp, cache_k, cache_v, input_ids,
                        steps: int, backend: str = "reference",
                        variant=None):
    b, s = input_ids.shape
    logits, cache_k, cache_v = prefill(cfg, sp, cache_k, cache_v, input_ids, backend)
    tok0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    if variant:
        mp = _mega_pack_for(cfg, sp, variant)
        ck, cv = _mega_cache(cfg, cache_k, cache_v)

        def mbody(carry, _):
            ck, cv, tok, pos = carry
            logits, ck, cv = _decode_one_mega(cfg, sp, mp, ck, cv, tok, pos,
                                              variant)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (ck, cv, nxt, pos + 1), tok

        (_, _, last, _), toks = jax.lax.scan(
            mbody, (ck, cv, tok0, jnp.int32(s)), None, length=steps - 1)
        return jnp.concatenate([jnp.moveaxis(toks, 0, 1), last[:, None]],
                               axis=1)

    def body(carry, _):
        ck, cv, tok, pos = carry
        logits, ck, cv = _decode_one(cfg, sp, ck, cv, tok, pos, backend)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (ck, cv, nxt, pos + 1), tok

    (_, _, last, _), toks = jax.lax.scan(
        body, (cache_k, cache_v, tok0, jnp.int32(s)), None, length=steps - 1)
    return jnp.concatenate([jnp.moveaxis(toks, 0, 1), last[:, None]], axis=1)


def generate_tokens(cfg: ModelConfig, sp, cache_k, cache_v, input_ids, key,
                    max_new_tokens: int, temperature: float = 0.0,
                    top_k: int = 0, top_p: float = 1.0, eos_id: int = -1,
                    backend: str = "reference"):
    """Sampled generation on the stacked path — the engine.generate_tokens
    semantics (same _sample, same eos masking) at O(1) compile in depth.
    Host-level entry point: the megastep variant is resolved eagerly (see
    greedy_decode) so GANQ_MEGASTEP toggles never hit a stale jit cache."""
    variant = mega_enabled(cfg, sp, backend, input_ids.shape[0])
    return _generate_tokens_impl(cfg, sp, cache_k, cache_v, input_ids, key,
                                 max_new_tokens, temperature, top_k, top_p,
                                 eos_id, backend, variant)


@functools.partial(jax.jit, static_argnames=("cfg", "backend", "max_new_tokens",
                                             "temperature", "top_k", "top_p",
                                             "eos_id", "variant"),
                   donate_argnums=(2, 3))
def _generate_tokens_impl(cfg: ModelConfig, sp, cache_k, cache_v, input_ids,
                          key, max_new_tokens: int, temperature: float = 0.0,
                          top_k: int = 0, top_p: float = 1.0, eos_id: int = -1,
                          backend: str = "reference", variant=None):
    from .engine import _sample

    b, s = input_ids.shape
    logits0, cache_k, cache_v = prefill(cfg, sp, cache_k, cache_v, input_ids,
                                        backend)
    key, k0 = jax.random.split(key)
    tok0 = _sample(logits0, k0, temperature, top_k, top_p)
    done0 = (tok0 == eos_id) if eos_id >= 0 else jnp.zeros((b,), bool)

    if variant:
        mp = _mega_pack_for(cfg, sp, variant)
        ck, cv = _mega_cache(cfg, cache_k, cache_v)

        def mbody(carry, _):
            ck, cv, tok, pos, key, done = carry
            logits, ck, cv = _decode_one_mega(cfg, sp, mp, ck, cv, tok, pos,
                                              variant)
            key, sub = jax.random.split(key)
            nxt = _sample(logits, sub, temperature, top_k, top_p)
            nxt = jnp.where(done, eos_id if eos_id >= 0 else 0, nxt)
            done = done | ((nxt == eos_id) if eos_id >= 0 else False)
            return (ck, cv, nxt, pos + 1, key, done), tok

        (_, _, last, _, _, _), toks = jax.lax.scan(
            mbody, (ck, cv, tok0, jnp.int32(s), key, done0), None,
            length=max_new_tokens - 1)
        toks = jnp.moveaxis(toks, 0, 1)
        return jnp.concatenate([toks, last[:, None]], axis=1)

    def body(carry, _):
        ck, cv, tok, pos, key, done = carry
        logits, ck, cv = _decode_one(cfg, sp, ck, cv, tok, pos, backend)
        key, sub = jax.random.split(key)
        nxt = _sample(logits, sub, temperature, top_k, top_p)
        nxt = jnp.where(done, eos_id if eos_id >= 0 else 0, nxt)
        done = done | ((nxt == eos_id) if eos_id >= 0 else False)
        return (ck, cv, nxt, pos + 1, key, done), tok

    (_, _, last, _, _, _), toks = jax.lax.scan(
        body, (cache_k, cache_v, tok0, jnp.int32(s), key, done0), None,
        length=max_new_tokens - 1)
    toks = jnp.moveaxis(toks, 0, 1)
    return jnp.concatenate([toks, last[:, None]], axis=1)


@functools.partial(jax.jit, static_argnames=("cfg", "backend"))
def decode_step(cfg: ModelConfig, sp, cache_k, cache_v, token, pos,
                backend: str = "reference"):
    return _decode_one(cfg, sp, cache_k, cache_v, token, pos, backend)


def init_cache(cfg: ModelConfig, n_layers: int, batch: int, max_seq: int,
               dtype=jnp.bfloat16) -> Tuple[jax.Array, jax.Array]:
    base = (n_layers, batch, max_seq, cfg.kv_cache_heads)
    return (jnp.zeros((*base, cfg.k_cache_dim), dtype),
            jnp.zeros((*base, cfg.v_cache_dim), dtype))


__all__ = ["stack_layers", "prefill", "greedy_decode",
           "generate_tokens", "decode_step", "init_cache"]
