"""Layer-wise sequential PTQ engine.

The JAX-idiomatic replacement for the reference's hook-driven
``ModuleLooper.loop`` (``gptqmodel/looper/module_looper.py:129-443``): instead
of torch forward hooks + exception-aborted forwards, the functional layer
returns submodule-input *taps* directly, and the engine is a plain loop:

    layer-0 inputs = embed(calib)                (cache_inputs, looper:44-127)
    for layer:                                    (looper:205)
      for subset in layer_modules:                (true_sequential, looper:236)
        taps   = layer_forward(params, x, want_taps)   # fwd w/ current quant state
        H      = accumulate(taps[subset])              # gptq.py:96-131
        params = quantize(subset modules)              # -> fake-quant weights
      x = layer_forward(params, x)                # re-forward (looper:354-396)
    optional lm_head pass through the final norm  (base.py:1300-1310)

Per-module artifacts (LUT codebooks / uniform codes) are collected for the
packer; weights in ``params`` are replaced by their fake-quant values so later
subsets/layers see quantized outputs, exactly like the reference
(gptq_processor.py:193).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import QUANT_METHOD, QuantizeConfig
from ..models import hf_import
from ..models.registry import ArchSpec
from ..models.transformer import (ModelConfig, causal_mask, embed,
                                  layer_forward, rope_for_layer,
                                  rope_tables_all, apply_norm)
from ..ops import qlinear
from ..utils.logger import get_logger
from .ganq import ganq_quantize
from .gptq import gptq_quantize
from .hessian import HessianAccumulator

log = get_logger(__name__)


@dataclass
class ModuleQuantLog:
    layer: int
    module: str
    method: str
    loss: float
    damp: float
    duration: float
    extra: Dict[str, Any] = field(default_factory=dict)


@dataclass
class QuantizedModule:
    """Solver artifact for one linear, consumed by the packer."""
    method: QUANT_METHOD
    bits: int
    group_size: int
    # ganq
    lut: Optional[jax.Array] = None          # [out, 2^bits]
    idx: Optional[jax.Array] = None          # [out, in] int32
    # gptq
    qidx: Optional[jax.Array] = None         # [out, in] int32
    scale: Optional[jax.Array] = None
    zero: Optional[jax.Array] = None
    g_idx: Optional[jax.Array] = None
    # QQQ: calibrated per-channel 8-bit sym scale of the ORIGINAL weight
    # (reference quantization/qqq.py:21-35), for the W4A8 two-level scheme
    scale_extra: Optional[jax.Array] = None  # [out]
    # EoRA adapter (optional)
    lora_a: Optional[jax.Array] = None       # [rank, in]
    lora_b: Optional[jax.Array] = None       # [out, rank]


@dataclass
class QuantizeOutput:
    params: Dict[str, Any]                   # fake-quantized params pytree
    artifacts: Dict[str, QuantizedModule]    # full module name -> artifact
    log: List[ModuleQuantLog]


@partial(jax.jit, static_argnames=("cfg", "want_taps", "window"))
def _layer_fwd(cfg: ModelConfig, lp, x, mask, rope, want_taps: bool,
               window: Optional[int] = None, kv_override=None):
    return layer_forward(cfg, lp, x, mask, rope, want_taps=want_taps,
                         window=window, kv_override=kv_override)


@partial(jax.jit, static_argnames=("cfg",))
def _embed_fwd(cfg: ModelConfig, params, ids, positions):
    return embed(cfg, params, ids, positions)


def _full_name(spec: ArchSpec, layer_idx: int, module_name: str) -> str:
    return f"{spec.layers_prefix}.{layer_idx}.{module_name}"


def _adapter_rank(qcfg: QuantizeConfig, full_name: str) -> int:
    """Effective EoRA rank for a module: qcfg.adapter["rank"] with per-module
    dynamic overrides (reference config.py:341-357)."""
    if not qcfg.adapter:
        return 0
    rank = int(qcfg.adapter.get("rank", 0))
    dyn = qcfg.dynamic_get(full_name, "adapter", default=None, sub_key="rank")
    if isinstance(dyn, (int, float)):
        rank = int(dyn)
    return rank


def _quantize_one(W: jax.Array, H: jax.Array, eff_cfg: QuantizeConfig,
                  nsamples: int, codebook_init_fn=None,
                  ) -> Tuple[jax.Array, QuantizedModule, float, float]:
    if eff_cfg.quant_method == QUANT_METHOD.GANQ:
        r = ganq_quantize(W, H, eff_cfg, nsamples,
                          codebook_init_fn=codebook_init_fn)
        art = QuantizedModule(method=QUANT_METHOD.GANQ, bits=eff_cfg.bits,
                              group_size=eff_cfg.group_size, lut=r.lut, idx=r.idx)
        return r.Q, art, r.avg_loss, r.damp_used
    if eff_cfg.quant_method == QUANT_METHOD.AUTO_ROUND:
        from .autoround import autoround_quantize
        r = autoround_quantize(W, H, eff_cfg, nsamples)
        art = QuantizedModule(method=QUANT_METHOD.AUTO_ROUND, bits=eff_cfg.bits,
                              group_size=eff_cfg.group_size, qidx=r.qidx,
                              scale=r.scale, zero=r.zero, g_idx=r.g_idx)
        return r.Q, art, r.avg_loss, r.damp_used
    r = gptq_quantize(W, H, eff_cfg, nsamples)
    scale_extra = None
    if (eff_cfg.quant_method == QUANT_METHOD.QQQ
            and eff_cfg.group_size not in (-1, W.shape[1])):
        # grouped W4A8: calibrated per-channel 8-bit sym scale of the
        # ORIGINAL weight (reference qqq.py:21-35 runs an 8-bit sym
        # per-channel find_params with mse=0 -> scale = 2*max|w|/255)
        amax = jnp.max(jnp.abs(W), axis=1)
        scale_extra = 2.0 * amax / 255.0
    art = QuantizedModule(method=eff_cfg.quant_method, bits=eff_cfg.bits,
                          group_size=eff_cfg.group_size, qidx=r.qidx,
                          scale=r.scale, zero=r.zero, g_idx=r.g_idx,
                          scale_extra=scale_extra)
    return r.Q, art, r.avg_loss, r.damp_used


def _save_layer_state(resume_dir: str, li: int, layer_arts: Dict[str, "QuantizedModule"],
                      layer_weights: Dict[str, np.ndarray]) -> None:
    import os
    os.makedirs(resume_dir, exist_ok=True)
    blobs: Dict[str, np.ndarray] = {}
    for name, art in layer_arts.items():
        blobs[f"{name}::method"] = np.asarray(str(art.method))
        blobs[f"{name}::bits"] = np.asarray(art.bits)
        blobs[f"{name}::group_size"] = np.asarray(art.group_size)
        for f in ("lut", "idx", "qidx", "scale", "zero", "g_idx",
                  "lora_a", "lora_b"):
            v = getattr(art, f)
            if v is not None:
                blobs[f"{name}::{f}"] = np.asarray(v)
    for slot, w in layer_weights.items():
        blobs[f"__w__::{slot}"] = np.asarray(w)
    # np.savez force-appends .npz — keep the temp name compliant
    tmp = os.path.join(resume_dir, f"layer_{li}.tmp.npz")
    np.savez(tmp, **blobs)
    os.replace(tmp, os.path.join(resume_dir, f"layer_{li}.npz"))


def _load_layer_state(resume_dir: str, li: int):
    import os
    path = os.path.join(resume_dir, f"layer_{li}.npz")
    if not os.path.isfile(path):
        return None
    data = np.load(path, allow_pickle=False)
    arts: Dict[str, QuantizedModule] = {}
    weights: Dict[str, np.ndarray] = {}
    fields: Dict[str, Dict[str, Any]] = {}
    for key in data.files:
        name, f = key.split("::", 1)
        if name == "__w__":
            weights[f] = data[key]
        else:
            fields.setdefault(name, {})[f] = data[key]
    for name, fd in fields.items():
        arts[name] = QuantizedModule(
            method=QUANT_METHOD(str(fd["method"])),
            bits=int(fd["bits"]), group_size=int(fd["group_size"]),
            **{f: jnp.asarray(fd[f]) for f in
               ("lut", "idx", "qidx", "scale", "zero", "g_idx",
                "lora_a", "lora_b") if f in fd})
    return arts, weights


def quantize_model(
    cfg: ModelConfig,
    params: Dict[str, Any],
    spec: ArchSpec,
    qcfg: QuantizeConfig,
    calib_batches: Sequence[np.ndarray],
    codebook_init_fn=None,
    resume_dir: Optional[str] = None,
) -> QuantizeOutput:
    """Quantize every layer's linears in place (fake-quant) and collect artifacts.

    ``calib_batches``: sequence of int32 [batch, seq] token-id arrays.
    ``resume_dir``: when set, per-layer results are checkpointed there and a
    crashed run resumes after the last completed layer (the reference
    restarts from scratch, SURVEY.md §5.4).
    """
    n_layers = cfg.num_hidden_layers
    subsets: List[List[str]] = spec.layer_modules
    if not qcfg.true_sequential:
        subsets = [[m for sub in spec.layer_modules for m in sub]]

    artifacts: Dict[str, QuantizedModule] = {}
    qlog: List[ModuleQuantLog] = []

    if qcfg.lm_head and "lm_head" not in params:
        # reference module_looper.py:131-135: tied lm_head cannot be
        # quantized independently of the embedding — fail before any work
        raise NotImplementedError(
            "lm_head quantization requires untied weights "
            "(tie_word_embeddings=False)")

    # ---- stage 0: layer-0 inputs (the reference's cache_inputs)
    # Integer batches [b, s] are token ids (embedded here); float batches
    # [b, s, hidden] are PRE-EMBEDDED layer-0 inputs — the multimodal
    # calibration path (vision towers run outside this framework, e.g. via
    # models/vl_calib.capture_decoder_inputs; the reference captures the
    # same tensor with a pre-forward hook, module_looper.py:54-117).
    acts: List[jax.Array] = []
    ropes: List[Any] = []
    masks: List[jax.Array] = []
    embed_dtype = params["embed_tokens"]["weight"].dtype
    for batch in calib_batches:
        arr = np.asarray(batch)
        if np.issubdtype(arr.dtype, np.floating):
            # layer-0 inputs are POST-project_in: always hidden_size wide
            # (OPT-350m's word_embed_proj_dim applies before project_in)
            if arr.ndim != 3 or arr.shape[-1] != cfg.hidden_size:
                raise ValueError(
                    "pre-embedded calibration batches must be "
                    f"[batch, seq, {cfg.hidden_size}] floats, got {arr.shape}")
            b, s = arr.shape[:2]
            positions = jnp.broadcast_to(jnp.arange(s), (b, s))
            acts.append(jnp.asarray(arr, embed_dtype))
        else:
            ids = jnp.asarray(arr)
            b, s = ids.shape
            m = cfg.num_meta_tokens or 0
            if m and "meta_tokens" in params:
                # hymba: serving prepends the learned meta tokens
                # (transformer.forward), so calibration sees them too —
                # the reference calibrates through the model's own forward
                positions = jnp.broadcast_to(jnp.arange(s + m), (b, s + m))
                x0 = _embed_fwd(cfg, params, ids,
                                jnp.broadcast_to(jnp.arange(s) + m, (b, s)))
                meta = params["meta_tokens"].astype(x0.dtype)
                x0 = jnp.concatenate(
                    [jnp.broadcast_to(meta[None], (b, m, meta.shape[1])),
                     x0], axis=1)
                acts.append(x0)
                s = s + m
            else:
                positions = jnp.broadcast_to(jnp.arange(s), (b, s))
                acts.append(_embed_fwd(cfg, params, ids, positions))
        ropes.append(rope_tables_all(cfg, positions)
                     if cfg.pos == "rope" else None)
        masks.append(causal_mask(s, s))
    nsamples = sum(int(a.shape[0]) for a in acts)

    # hymba cross-layer KV sharing: calibrate CONSUMER layers on the
    # PRODUCER's fresh k/v — the serving-time activation distribution
    # (reference module_looper.py:305-313 keeps the model's own forward
    # semantics). Producer k/v are saved from the post-quantization
    # re-forward, so consumers calibrate against quantized producer keys,
    # exactly what they will attend over at serving. GANQ_HYMBA_OWNKV=1
    # restores the round-3 own-KV behavior for A/B.
    import os as _os
    reuse = getattr(cfg, "kv_reuse_map", None)
    if _os.environ.get("GANQ_HYMBA_OWNKV") == "1":
        reuse = None
    producers = (set(j for i, j in enumerate(reuse) if j != i)
                 if reuse is not None else set())
    kv_saved: List[Dict[int, Any]] = [dict() for _ in acts]

    def _kvo(li: int, bi: int):
        if reuse is None or reuse[li] == li:
            return None
        return kv_saved[bi].get(reuse[li])

    # ---- per-layer sequential loop
    for li in range(n_layers):
        lp = params["layers"][li]
        t_layer = time.perf_counter()

        if resume_dir is not None:
            restored = _load_layer_state(resume_dir, li)
            if restored is not None:
                layer_arts, layer_weights = restored
                artifacts.update(layer_arts)
                for slot, w in layer_weights.items():
                    lin = hf_import.get_module(params, li, slot)
                    lin["weight"] = jnp.asarray(w, lin["weight"].dtype)
                new_acts = []
                for bi, (x, mask, rope) in enumerate(
                        zip(acts, masks, ropes)):
                    y, lc, _ = _layer_fwd(cfg, lp, x, mask,
                                          rope_for_layer(cfg, rope, li),
                                          False,
                                          window=cfg.layer_window(li),
                                          kv_override=_kvo(li, bi))
                    if li in producers:
                        kv_saved[bi][li] = {"k": lc["k"], "v": lc["v"]}
                    new_acts.append(y)
                acts = new_acts
                log.info(f"layer {li}: restored from {resume_dir}")
                continue

        layer_arts: Dict[str, QuantizedModule] = {}
        layer_weights: Dict[str, np.ndarray] = {}

        # Block-scope AutoRound: one joint optimization per layer against
        # the layer-output MSE (the external package's nblocks=1 default;
        # quant/autoround_block.py). Every module of the layer must resolve
        # to AUTO_ROUND with plain dict linears — MoE expert arrays and
        # EoRA ranks fall back to module scope.
        subsets_for_layer = subsets
        if (qcfg.quant_method == QUANT_METHOD.AUTO_ROUND
                and qcfg.autoround_scope == "block"):
            todo_all: List[Tuple[str, str, QuantizeConfig]] = []
            eligible = True
            for sub in subsets:
                for mod in sub:
                    slot = spec.module_slots[mod]
                    if any(part.isdigit() for part in slot.split(".")):
                        eligible = False
                        continue
                    if hf_import.get_module(params, li, slot) is None:
                        continue
                    eff = qcfg.for_module(_full_name(spec, li, mod))
                    if eff is None:
                        continue
                    if (eff.quant_method != QUANT_METHOD.AUTO_ROUND
                            or _adapter_rank(qcfg, _full_name(spec, li, mod))):
                        eligible = False
                    todo_all.append((mod, slot, eff))
            if eligible and todo_all:
                from .autoround_block import autoround_block_quantize
                t0 = time.perf_counter()
                layer_rope = [rope_for_layer(cfg, r, li) for r in ropes]
                new_w, results, block_loss = autoround_block_quantize(
                    cfg, lp, todo_all, acts, masks, layer_rope,
                    cfg.layer_window(li), qcfg, nsamples)
                dur = time.perf_counter() - t0
                for mod, slot, eff in todo_all:
                    r = results[mod]
                    lin = hf_import.get_module(params, li, slot)
                    lin["weight"] = new_w[slot].astype(lin["weight"].dtype)
                    full = _full_name(spec, li, mod)
                    art = QuantizedModule(
                        method=QUANT_METHOD.AUTO_ROUND, bits=eff.bits,
                        group_size=eff.group_size, qidx=r.qidx,
                        scale=r.scale, zero=r.zero, g_idx=r.g_idx)
                    artifacts[full] = art
                    layer_arts[full] = art
                    layer_weights[slot] = np.asarray(lin["weight"])
                    qlog.append(ModuleQuantLog(
                        layer=li, module=mod, method="auto_round/block",
                        loss=r.avg_loss, damp=0.0,
                        duration=dur / max(len(todo_all), 1)))
                log.info(f"layer {li:3d} block autoround "
                         f"loss={block_loss:.6f} time={dur:5.1f}s")
                subsets_for_layer = []
            elif todo_all:
                log.info(f"layer {li}: block autoround ineligible "
                         "(experts/adapters/mixed methods) — module scope")

        for subset in subsets_for_layer:
            # resolve modules that are quantizable under dynamic rules
            todo: List[Tuple[str, str, QuantizeConfig]] = []  # (module_name, slot, cfg)
            for mod in subset:
                slot = spec.module_slots[mod]
                if hf_import.get_module(params, li, slot) is None:
                    continue
                eff = qcfg.for_module(_full_name(spec, li, mod))
                if eff is None:
                    log.info(f"layer {li}: skipping {mod} (dynamic exclude)")
                    continue
                todo.append((mod, slot, eff))
            if not todo:
                continue

            # accumulate Hessians: one per unique tap (q/k/v share inputs)
            slots_needed = {slot for _, slot, _ in todo}
            accs: Dict[str, HessianAccumulator] = {}
            for bi, (x, mask, rope) in enumerate(zip(acts, masks, ropes)):
                _, _, taps = _layer_fwd(cfg, lp, x, mask,
                                        rope_for_layer(cfg, rope, li),
                                        True, window=cfg.layer_window(li),
                                        kv_override=_kvo(li, bi))
                for slot in slots_needed:
                    tap = taps[slot]
                    if slot not in accs:
                        accs[slot] = HessianAccumulator(tap.shape[-1])
                    accs[slot].update(tap)
            H_by_slot = {s: a.finalize() for s, a in accs.items()}

            # solve each module
            for mod, slot, eff in todo:
                # MoE experts with no routed calibration tokens have an
                # all-zero Hessian — skip them like the reference
                # (module_looper.py:333-343)
                if float(jnp.sum(jnp.abs(jnp.diagonal(H_by_slot[slot])))) == 0.0:
                    log.warning(f"layer {li}: {mod} saw no activations; skipped")
                    continue
                t0 = time.perf_counter()
                lin = hf_import.get_module(params, li, slot)
                W = lin["weight"]
                Wq, art, avg_loss, damp = _quantize_one(
                    W, H_by_slot[slot], eff, nsamples,
                    codebook_init_fn=codebook_init_fn)
                full = _full_name(spec, li, mod)
                rank = _adapter_rank(qcfg, full)
                if rank:
                    # EoRA accuracy recovery: activation-weighted low-rank fit
                    # of the quantization error; later layers see the
                    # corrected weight (reference eora_processor.py:119-159)
                    from ..adapter.eora import compute_eora
                    cov = accs[slot].acc / max(accs[slot].nsamples, 1)
                    A, B = compute_eora(W - Wq, cov, rank)
                    art.lora_a, art.lora_b = A, B
                    Wq = Wq + jnp.dot(B, A, precision=jax.lax.Precision.HIGHEST)
                lin["weight"] = Wq.astype(W.dtype)
                artifacts[full] = art
                layer_arts[full] = art
                layer_weights[slot] = np.asarray(lin["weight"])
                dur = time.perf_counter() - t0
                qlog.append(ModuleQuantLog(
                    layer=li, module=mod, method=str(eff.quant_method),
                    loss=avg_loss, damp=damp, duration=dur))
                log.info(f"layer {li:3d} {mod:22s} loss={avg_loss:10.4f} "
                         f"damp={damp:.4f} time={dur:5.1f}s")

        if resume_dir is not None:
            _save_layer_state(resume_dir, li, layer_arts, layer_weights)

        # re-forward to produce next layer's inputs (quantized outputs);
        # producer layers' fresh k/v are saved for kv-reuse consumers
        new_acts = []
        for bi, (x, mask, rope) in enumerate(zip(acts, masks, ropes)):
            y, lc, _ = _layer_fwd(cfg, lp, x, mask,
                                  rope_for_layer(cfg, rope, li), False,
                                  window=cfg.layer_window(li),
                                  kv_override=_kvo(li, bi))
            if li in producers:
                kv_saved[bi][li] = {"k": lc["k"], "v": lc["v"]}
            new_acts.append(y)
        acts = new_acts
        log.info(f"layer {li} done in {time.perf_counter() - t_layer:.1f}s")

    # ---- optional lm_head pass (inputs go through the final norm,
    #      reference base.py:1300-1310)
    if qcfg.lm_head and "lm_head" in params:
        if qcfg.for_module(spec.lm_head_name) is qcfg:
            # no dynamic rule matched: the reference injects (and PERSISTS
            # into the config, so the loader sees the right bits) a
            # conservative 8-bit/g32 default for the accuracy-critical
            # lm_head rather than the layer config (module_looper.py:145-150)
            import re as _re
            qcfg.dynamic = {**(qcfg.dynamic or {}),
                            f"+:{_re.escape(spec.lm_head_name)}$": {
                                "bits": 8, "group_size": 32, "sym": True,
                                "desc_act": False, "mse": 2.4}}
    if (qcfg.lm_head and "lm_head" in params
            and (eff := qcfg.for_module(spec.lm_head_name)) is not None):
        acc = HessianAccumulator(cfg.hidden_size if cfg.word_embed_proj_dim is None
                                 else cfg.word_embed_proj_dim)
        for x in acts:
            h = x
            if cfg.final_layer_norm and "final_norm" in params:
                h = apply_norm(params["final_norm"], h, cfg.norm, cfg.norm_eps)
            if "project_out" in params:
                h = qlinear.apply(params["project_out"], h)
            acc.update(h)
        lin = params["lm_head"]
        W = lin["weight"]
        t0 = time.perf_counter()
        Wq, art, avg_loss, damp = _quantize_one(W, acc.finalize(), eff,
                                                nsamples,
                                                codebook_init_fn=codebook_init_fn)
        lin["weight"] = Wq.astype(W.dtype)
        artifacts[spec.lm_head_name] = art
        qlog.append(ModuleQuantLog(layer=-1, module=spec.lm_head_name,
                                   method=str(eff.quant_method), loss=avg_loss,
                                   damp=damp, duration=time.perf_counter() - t0))

    from ..utils.observability import quant_log_table
    log.info("quantization summary:\n" + quant_log_table(qlog))
    return QuantizeOutput(params=params, artifacts=artifacts, log=qlog)


def packed_params(spec: ArchSpec, out: QuantizeOutput) -> Dict[str, Any]:
    """Realize solver artifacts as packed QLinear leaves on a copy of the
    fake-quant params — the in-memory equivalent of the save_quantized ->
    load_quantized round trip (formats/checkpoint.py), so a freshly
    quantized model can serve through the packed kernel paths (and their
    recode/certify transforms) without touching disk.

    GANQ artifacts become "lut" linears (codebook + packed 4-bit codes),
    GPTQ/AutoRound/QQQ become "uniform" linears; biases and EoRA adapters
    ride along. Reference semantics: pack_model, utils/model.py:552-639.
    """
    params = jax.tree_util.tree_map(
        lambda x: x, out.params,
        is_leaf=lambda x: isinstance(x, qlinear.QLinear))

    def build(art: QuantizedModule, bias):
        if art.lut is not None:
            ql = qlinear.lut_linear(art.lut, art.idx, art.bits, bias)
        else:
            ql = qlinear.uniform_linear(art.qidx, art.scale, art.zero,
                                        art.g_idx, art.bits, bias)
            if art.scale_extra is not None:
                ql["scale_extra"] = jnp.asarray(art.scale_extra, jnp.float32)
        if art.lora_a is not None:
            ql["lora_a"], ql["lora_b"] = art.lora_a, art.lora_b
        return ql

    for full, art in out.artifacts.items():
        if full == spec.lm_head_name:
            old = params.get("lm_head")
            if old is None:
                continue
            params["lm_head"] = build(art, old.get("bias"))
            continue
        rest = full[len(spec.layers_prefix) + 1:]
        li_s, mod = rest.split(".", 1)
        slot = spec.module_slots.get(mod)
        if slot is None:
            continue
        old = hf_import.get_module(params, int(li_s), slot)
        if old is None:
            continue
        hf_import.set_module(params, int(li_s), slot,
                             build(art, old.get("bias")))
    return params


__all__ = ["quantize_model", "packed_params", "QuantizeOutput",
           "QuantizedModule", "ModuleQuantLog"]
