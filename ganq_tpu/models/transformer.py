"""Functional decoder-only transformer covering the OPT and Llama families.

The TPU-idiomatic replacement for the reference's per-architecture nn.Module
definitions (``gptqmodel/models/definitions/*``): one configurable pure
function over a params pytree. Architecture knobs (norm type, activation,
positional scheme, biases, GQA, tied embeddings, OPT's project_in/out) are
data in :class:`ModelConfig`; per-arch entries live in ``registry.py`` with
the same declarative role as the reference's ``base_modules``/``layer_modules``
contracts (``models/base.py:69-124``).

Quantization needs no forward hooks: ``layer_forward(..., want_taps=True)``
returns the inputs of every quantizable submodule (the reference's
``HookedLinear`` capture, ``nn_modules/hooked_linear.py``), keyed by the same
module names the reference uses so dynamic-override regexes written for it
keep working.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import qlinear


class _HashableDict(dict):
    """dict that hashes by sorted items — keeps ModelConfig usable as a jit
    static argument when HF configs carry mapping-valued knobs
    (rope_scaling). Values must themselves be hashable (scalars/strings)."""

    def __hash__(self):  # type: ignore[override]
        return hash(tuple(sorted(self.items())))


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    model_type: str                   # "opt" | "llama" | derivatives
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_hidden_layers: int
    num_attention_heads: int
    num_key_value_heads: int
    head_dim: int
    max_position_embeddings: int = 2048

    norm: str = "rmsnorm"             # rmsnorm | layernorm
    norm_eps: float = 1e-5
    rms_offset: float = 0.0           # gemma: weight stored as (w - 1)
    act: str = "silu"                 # relu | gelu | silu (glu when gated_mlp)
    gated_mlp: bool = True
    pos: str = "rope"                 # rope | learned
    pos_offset: int = 0               # OPT bakes a +2 offset into the table
    embed_scale: Optional[float] = None  # gemma: sqrt(hidden) multiplier
    rope_theta: float = 10000.0
    rope_scaling: Optional[Dict[str, Any]] = None
    # gemma3: sliding layers use a separate unscaled rope at this theta
    # (rope_local_base_freq); full layers use rope_theta + rope_scaling
    rope_local_theta: Optional[float] = None
    # exaone4 hybrid attention: full-attention layers use NO positional
    # rotation at all (global NoPE) — expressed as identity rope tables so
    # every serving path (incl. the stacked scan's where-select) just works
    rope_nope_full: bool = False

    attn_bias: bool = False
    mlp_bias: bool = False
    tie_word_embeddings: bool = False

    # OPT-specific
    do_layer_norm_before: bool = True
    word_embed_proj_dim: Optional[int] = None  # OPT-350m projection dim
    final_layer_norm: bool = True

    attn_scale: Optional[float] = None  # default 1/sqrt(head_dim)

    # MoE (mixtral-family)
    num_experts: int = 0               # 0 = dense mlp
    num_experts_per_tok: int = 2

    # qwen2_moe/olmoe norm_topk_prob: renormalize the selected top-k routing
    # weights to sum 1 (mixtral always does; qwen2moe/olmoe default off)
    moe_norm_topk: bool = True
    # deepseek MoE routing (v2/v3): score function ("softmax" | "sigmoid",
    # sigmoid adds the v3 e_score_correction_bias for SELECTION only),
    # group-limited top-k (n_group expert groups, best topk_group kept;
    # group score = max for v2, top-2 sum for v3 "noaux_tc"), and a fixed
    # multiplier on the routed combine
    moe_scoring: str = "softmax"
    moe_topk_method: str = "greedy"   # greedy | group_limited_greedy | noaux_tc
    moe_n_group: int = 1
    moe_topk_group: int = 1
    moe_routed_scale: float = 1.0
    # phimoe: "sparsemixer" routing — per-expert masked softmaxes instead of
    # one softmax + top-k (modeling_phimoe.py sparsemixer, inference branch)
    moe_router_mode: str = "topk"     # topk | sparsemixer
    router_jitter_eps: float = 0.01   # sparsemixer threshold half-width
    # MLA (deepseek v2/v3): low-rank compressed q/kv projections with a
    # rope/nope head-dim split (modeling_deepseek_v2.py DeepseekV2Attention)
    mla: bool = False
    q_lora_rank: Optional[int] = None   # None = direct q_proj (v2-lite)
    kv_lora_rank: int = 512
    qk_nope_head_dim: int = 128
    qk_rope_head_dim: int = 64
    v_head_dim: int = 128
    # q/k normalization before rope: False | True/"head" (qwen3: per-head
    # RMSNorm over head_dim) | "flat" (olmo2: RMSNorm over the whole q/kv
    # projection dim, applied before the head reshape)
    qk_norm: Any = False
    # gpt-neox/gptj-family: rope on only the first rotary_dim of head_dim
    rotary_dim: Optional[int] = None
    # gptj/codegen: rotary pairs are adjacent lanes (rotate_every_two) rather
    # than the HF half-split rotate_half layout
    rope_interleaved: bool = False
    # gpt-neox: attn and mlp both read the post-input-norm x and add jointly
    parallel_residual: bool = False
    # bloom: LayerNorm applied right after the token embedding
    embed_norm: bool = False
    # olmo2: norms are applied to each sublayer's OUTPUT before the residual
    # add (x += norm(attn(x)); x += norm(mlp(x))) instead of to its input.
    # The "input_norm"/"post_norm" slots then hold HF's
    # post_attention_layernorm / post_feedforward_layernorm respectively.
    norm_after_sublayer: bool = False
    # gemma2: each sublayer is wrapped in norms on BOTH sides —
    # x += post_attn_norm(attn(input_norm(x))); x += post_mlp_norm(mlp(post_norm(x)))
    # using the extra "post_attn_norm"/"post_mlp_norm" layer slots.
    sandwich_norm: bool = False
    # gemma2: logits softcapped as cap*tanh(x/cap) — on attention scores
    # (before masking) and on the final lm-head logits respectively
    attn_softcap: Optional[float] = None
    logit_softcap: Optional[float] = None
    # sliding-window attention: window size plus the per-layer pattern —
    # a tuple of "sliding_attention"/"full_attention" (HF layer_types)
    sliding_window: Optional[int] = None
    layer_types: Optional[Tuple[str, ...]] = None
    # cohere: final logits multiplier; granite: set to 1/logits_scaling
    logit_scale: Optional[float] = None
    # granite: x = residual + multiplier * sublayer_out
    residual_multiplier: Optional[float] = None
    # alibi slope construction: "bloom" (HF build_alibi_tensor) or "mpt"
    # (mosaic's alibi_bias_max=8 grid with odd/even interleave)
    alibi_kind: str = "bloom"
    # mpt attn_config.clip_qkv: clamp q/k/v projections to [-c, c]
    clip_qkv: Optional[float] = None
    # decilm: variable GQA — per-layer kv-head counts
    # (config.num_key_value_heads_per_layer); num_key_value_heads then holds
    # the max, used only for uniform-cache callers. The forward infers each
    # layer's kv width from its projection tensors, so per-layer caches and
    # attention need no layer index plumbing.
    kv_heads_per_layer: Optional[Tuple[int, ...]] = None
    # hymba hybrid-head layers (reference models/definitions/hymba.py; the
    # block follows the Hymba paper: one in_proj feeds parallel SSM and
    # attention heads, their normed outputs are averaged, out_proj closes):
    # ssm_hybrid turns the layer into attn∥mamba; ssm_inner = d_inner (must
    # equal q_dim so the two branch outputs can average); ssm_state = N;
    # ssm_conv = depthwise kernel K; ssm_dt_rank = Δ low-rank width.
    ssm_hybrid: bool = False
    ssm_inner: Optional[int] = None
    ssm_state: int = 16
    ssm_conv: int = 4
    ssm_dt_rank: Optional[int] = None
    # learnable prompt-prefix tokens (hymba meta tokens): prepended at
    # prefill, occupy cache rows [0, m) and rope positions [0, m)
    num_meta_tokens: int = 0
    # cross-layer KV sharing: kv_reuse_map[i] = j (j <= i) means layer i
    # attends over layer j's (updated) KV cache instead of its own; j == i
    # (or None map) = every layer computes its own
    kv_reuse_map: Optional[Tuple[int, ...]] = None

    def __post_init__(self):
        if isinstance(self.kv_reuse_map, list):
            object.__setattr__(self, "kv_reuse_map",
                               tuple(self.kv_reuse_map))
        if isinstance(self.rope_scaling, dict):
            object.__setattr__(self, "rope_scaling",
                               _HashableDict(self.rope_scaling))
        if isinstance(self.layer_types, list):
            object.__setattr__(self, "layer_types", tuple(self.layer_types))

    def layer_kv_heads(self, i: int) -> int:
        """KV-cache head count for layer i (decilm variable GQA)."""
        if self.kv_heads_per_layer is not None and not self.mla:
            return self.kv_heads_per_layer[i]
        return self.kv_cache_heads

    def layer_window(self, i: int) -> Optional[int]:
        """Static per-layer sliding window (None = full attention)."""
        if self.sliding_window is None:
            return None
        if self.layer_types is None:
            return self.sliding_window
        return (self.sliding_window
                if self.layer_types[i] == "sliding_attention" else None)

    @property
    def q_dim(self) -> int:
        return self.num_attention_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.num_key_value_heads * self.head_dim

    # KV-cache head dims (MLA caches full per-head k at nope+rope width and
    # v at its own width; everything else is symmetric at head_dim)
    @property
    def k_cache_dim(self) -> int:
        return (self.qk_nope_head_dim + self.qk_rope_head_dim if self.mla
                else self.head_dim)

    @property
    def v_cache_dim(self) -> int:
        return self.v_head_dim if self.mla else self.head_dim

    @property
    def kv_cache_heads(self) -> int:
        return self.num_attention_heads if self.mla else self.num_key_value_heads


# --------------------------------------------------------------------- norms
def apply_norm(np_: Dict[str, Any], x: jax.Array, kind: str, eps: float,
               offset: float = 0.0) -> jax.Array:
    xf = x.astype(jnp.float32)
    if kind == "rmsnorm":
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        w = np_["weight"].astype(jnp.float32) + offset
        y = xf * jax.lax.rsqrt(var + eps) * w
    else:
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + eps)
        # offset: nemotron's LayerNorm1P stores weight as (w - 1)
        y = y * (np_["weight"].astype(jnp.float32) + offset)
        if "bias" in np_:  # cohere's LayerNorm has no bias
            y = y + np_["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------- rope
def _rope_inv_freq(cfg: ModelConfig) -> Tuple[jax.Array, float]:
    """(inverse frequencies [rd/2], cos/sin post-scale). The scale is 1.0
    except for yarn, whose attention_factor (deepseek mscale variants)
    multiplies the tables — q and k both carry it, so attention logits gain
    the paper's mscale^2 without touching the softmax scale."""
    rd = cfg.rotary_dim or cfg.head_dim
    inv_freq = 1.0 / (cfg.rope_theta ** (jnp.arange(0, rd, 2, dtype=jnp.float32) / rd))
    rs = cfg.rope_scaling
    if rs and rs.get("rope_type", rs.get("type")) == "linear":
        inv_freq = inv_freq / rs["factor"]
        rs = None
    if rs and rs.get("rope_type", rs.get("type")) == "yarn":
        # HF modeling_rope_utils._compute_yarn_parameters
        factor = rs["factor"]
        att = rs.get("attention_factor")
        mscale, mscale_all = rs.get("mscale"), rs.get("mscale_all_dim")

        def get_mscale(scale, m=1.0):
            return 1.0 if scale <= 1 else 0.1 * m * math.log(scale) + 1.0

        if att is None:
            att = (float(get_mscale(factor, mscale) / get_mscale(factor, mscale_all))
                   if mscale and mscale_all else get_mscale(factor))
        beta_fast = rs.get("beta_fast") or 32
        beta_slow = rs.get("beta_slow") or 1
        orig = (rs.get("original_max_position_embeddings")
                or cfg.max_position_embeddings)

        def corr_dim(rot):
            return (rd * math.log(orig / (rot * 2 * math.pi))) / (2 * math.log(cfg.rope_theta))

        low, high = corr_dim(beta_fast), corr_dim(beta_slow)
        if rs.get("truncate", True):
            low, high = math.floor(low), math.ceil(high)
        low, high = max(low, 0), min(high, rd - 1)
        if low == high:
            high += 0.001
        ramp = jnp.clip(
            (jnp.arange(rd // 2, dtype=jnp.float32) - low) / (high - low), 0, 1)
        extrap = 1.0 - ramp          # 1 = keep original freq, 0 = interpolate
        inv_freq = (inv_freq / factor) * (1 - extrap) + inv_freq * extrap
        return inv_freq, att
    if rs and rs.get("rope_type", rs.get("type")) == "llama3":
        # HF llama3 frequency-dependent scaling (Llama-3.x checkpoints)
        factor = rs["factor"]
        lo = rs.get("low_freq_factor", 1.0)
        hi = rs.get("high_freq_factor", 4.0)
        orig = rs.get("original_max_position_embeddings", 8192)
        wavelen = 2 * math.pi / inv_freq
        low_wl = orig / lo
        high_wl = orig / hi
        scaled = inv_freq / factor
        smooth = (orig / wavelen - lo) / (hi - lo)
        mid = (1 - smooth) * scaled + smooth * inv_freq
        inv_freq = jnp.where(wavelen > low_wl, scaled,
                             jnp.where(wavelen < high_wl, inv_freq, mid))
    return inv_freq, 1.0


def rope_tables(cfg: ModelConfig, positions: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables [..., rd] for given positions. Half-split layout
    ([f0..fn, f0..fn], HF rotate_half) by default; interleaved
    ([f0, f0, f1, f1, ...], gptj duplicate_interleave) when
    ``cfg.rope_interleaved``."""
    inv_freq, att_scale = _rope_inv_freq(cfg)
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # [..., rd/2]
    if cfg.rope_interleaved:
        emb = jnp.repeat(freqs, 2, axis=-1)
    else:
        emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb) * att_scale, jnp.sin(emb) * att_scale


def rope_tables_all(cfg: ModelConfig, positions: jax.Array):
    """Every rope table the model needs. Single-rope models return the plain
    (cos, sin) tuple; dual-rope models (gemma3) return {"global", "local"} —
    select per layer with :func:`rope_for_layer`."""
    glob = rope_tables(cfg, positions)
    if cfg.rope_nope_full and cfg.layer_types is not None:
        # exaone4: sliding layers rotate normally; full layers are NoPE
        # (identity tables: cos=1, sin=0)
        return {"global": (jnp.ones_like(glob[0]), jnp.zeros_like(glob[1])),
                "local": glob}
    if cfg.rope_local_theta is None:
        return glob
    lcfg = dataclasses.replace(cfg, rope_theta=cfg.rope_local_theta,
                               rope_scaling=None)
    return {"global": glob, "local": rope_tables(lcfg, positions)}


def rope_for_layer(cfg: ModelConfig, rope, i: int):
    """Pick layer i's (cos, sin): sliding layers use the local table."""
    if isinstance(rope, dict):
        return (rope["local"] if cfg.layer_window(i) is not None
                else rope["global"])
    return rope


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array,
               interleaved: bool = False) -> jax.Array:
    """x: [b, s, heads, hd]; cos/sin: [b, s, rd]. When rd < hd (partial
    rotary, gpt-neox style) the tail passes through. ``interleaved`` pairs
    adjacent lanes (gptj rotate_every_two) instead of the half-split."""
    rd = cos.shape[-1]
    xr, x_pass = x[..., :rd], x[..., rd:]
    if interleaved:
        x1, x2 = xr[..., ::2], xr[..., 1::2]
        rot = jnp.stack([-x2, x1], axis=-1).reshape(xr.shape)
    else:
        half = rd // 2
        x1, x2 = xr[..., :half], xr[..., half:]
        rot = jnp.concatenate([-x2, x1], axis=-1)
    out = (xr * cos[:, :, None, :] + rot * sin[:, :, None, :]).astype(x.dtype)
    if x_pass.shape[-1]:
        out = jnp.concatenate([out, x_pass], axis=-1)
    return out


# ----------------------------------------------------------------- attention
def attention(q: jax.Array, k: jax.Array, v: jax.Array, mask: Optional[jax.Array],
              scale: float, bias: Optional[jax.Array] = None,
              softcap: Optional[float] = None) -> jax.Array:
    """q: [b, s, hq, d]; k,v: [b, t, hkv, d] -> [b, s, hq, d].

    GQA via grouped einsums — NOT jnp.repeat, which would materialize a
    g-times copy of the whole KV cache on every decode step. ``bias``
    [hq, t] is the ALiBi additive term (shift-invariant per-key form).
    ``softcap`` applies gemma2's cap*tanh(x/cap) to the scores pre-mask."""
    b, s, hq, d = q.shape
    hkv = k.shape[2]
    g = hq // hkv
    qg = q.reshape(b, s, hkv, g, d)
    logits = jnp.einsum("bshgd,bthd->bhgst", qg, k).astype(jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.reshape(hkv, g, 1, -1)[None]
    if softcap is not None:
        logits = softcap * jnp.tanh(logits / softcap)
    if mask is not None:
        logits = jnp.where(mask[:, :, None], logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhgst,bthd->bshgd", probs, v)
    return out.reshape(b, s, hq, v.shape[-1])  # MLA: v dim != qk dim


def alibi_slopes(n_heads: int, kind: str = "bloom") -> jax.Array:
    """ALiBi per-head slopes. ``kind="bloom"``: HF build_alibi_tensor
    (press et al.). ``kind="mpt"``: mosaic's variant — slopes 2^(-8i/P) on
    the P=2^ceil(log2 H) grid, odd-indexed then even-indexed when H < P
    (HF modeling_mpt.build_mpt_alibi_tensor). Both are applied in the
    shift-invariant per-key form slopes*key_pos (softmax-equivalent to the
    reference's relative form)."""
    import math as _math
    if kind == "mpt":
        p = 2 ** _math.ceil(_math.log2(n_heads))
        slopes = [2.0 ** (-(i + 1) * 8.0 / p) for i in range(p)]
        if p != n_heads:
            slopes = (slopes[1::2] + slopes[::2])[:n_heads]
        return jnp.asarray(slopes, jnp.float32)
    closest = 2 ** _math.floor(_math.log2(n_heads))
    base = 2.0 ** (-(2.0 ** -(_math.log2(closest) - 3)))
    slopes = [base ** (i + 1) for i in range(closest)]
    if closest < n_heads:
        extra_base = 2.0 ** (-(2.0 ** -(_math.log2(2 * closest) - 3)))
        slopes += [extra_base ** (2 * i + 1)
                   for i in range(n_heads - closest)]
    return jnp.asarray(slopes, jnp.float32)


def causal_mask(s: int, t: int, offset: int = 0) -> jax.Array:
    """[1, 1, s, t] boolean mask; query i attends keys <= i + offset."""
    qi = jnp.arange(s)[:, None] + offset
    ki = jnp.arange(t)[None, :]
    return (ki <= qi)[None, None]


# ------------------------------------------------------------------ mlp/layer
def _activation(x: jax.Array, act: str) -> jax.Array:
    if act == "relu":
        return jax.nn.relu(x)
    if act == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if act in ("gelu_tanh", "gelu_new", "gelu_pytorch_tanh"):
        return jax.nn.gelu(x, approximate=True)
    if act == "silu":
        return jax.nn.silu(x)
    if act == "relu2":  # nemotron: squared ReLU
        r = jax.nn.relu(x)
        return r * r
    raise ValueError(f"unknown activation {act}")


def _sparsemixer_gate(s: jax.Array, jitter_eps: float):
    """PhiMoE sparsemixer routing, inference branch (modeling_phimoe.py
    sparsemixer, training-only Gumbel/Heun machinery dropped). Top-2 by
    iterated argmax; each winner's combine weight is a softmax over only the
    experts within a relative threshold of that round's max:
    keep_j <=> (max - s_j) / max(|s_j|, max) <= 2*eps. Weights are NOT
    renormalized to sum 1. Returns (sel [.., E] bool, gated [.., E] f32)."""
    E = s.shape[-1]
    m1 = jnp.max(s, axis=-1, keepdims=True)
    oh1 = jax.nn.one_hot(jnp.argmax(s, axis=-1), E, dtype=s.dtype)
    keep1 = (m1 - s) / jnp.maximum(jnp.abs(s), m1) <= 2 * jitter_eps
    g1 = jax.nn.softmax(jnp.where(keep1, s, -jnp.inf), axis=-1)
    w1 = jnp.sum(g1 * oh1, axis=-1, keepdims=True)
    ms = jnp.where(oh1 > 0, -jnp.inf, s)         # mask out the first winner
    m2 = jnp.max(ms, axis=-1, keepdims=True)
    oh2 = jax.nn.one_hot(jnp.argmax(ms, axis=-1), E, dtype=s.dtype)
    # note: the threshold numerator uses the ORIGINAL scores (reference
    # modeling_phimoe.py:681-683) while the softmax base is the masked ones
    keep2 = (m2 - s) / jnp.maximum(jnp.abs(s), m2) <= 2 * jitter_eps
    g2 = jax.nn.softmax(jnp.where(keep2, ms, -jnp.inf), axis=-1)
    w2 = jnp.sum(g2 * oh2, axis=-1, keepdims=True)
    return (oh1 + oh2) > 0, oh1 * w1 + oh2 * w2


def _moe_forward(cfg: ModelConfig, moe: Dict[str, Any], h: jax.Array,
                 taps: Optional[Dict[str, jax.Array]], backend: str) -> jax.Array:
    """Mixtral-style sparse MoE, dense formulation: every expert runs on all
    tokens with zeroed routing weights for non-selected tokens (static shapes,
    no gather/scatter; compute waste E/k is the classic TPU trade at small E).

    Taps per expert are the routing-masked inputs: zero rows add nothing to
    the Hessian sum, so per-expert H matches the reference's hook capture of
    routed tokens (module_looper.py:333-343 semantics incl. the
    no-activation-expert case)."""
    router_logits = qlinear.apply(moe["router"], h, backend)     # [b, s, E]
    E = cfg.num_experts
    k = cfg.num_experts_per_tok
    if cfg.moe_router_mode == "sparsemixer":
        if k != 2:
            raise ValueError("sparsemixer routing requires top-2")
        sel, gated = _sparsemixer_gate(router_logits.astype(jnp.float32),
                                       cfg.router_jitter_eps)
        return _moe_combine(cfg, moe, h, sel, gated, taps, backend)
    if cfg.moe_scoring == "sigmoid":   # deepseek v3
        probs = jax.nn.sigmoid(router_logits.astype(jnp.float32))
    else:
        probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    # selection scores: v3 adds the e_score_correction_bias for CHOOSING
    # experts only — combine weights still come from the raw scores
    choice = probs
    if "router_bias" in moe:
        choice = choice + moe["router_bias"]["weight"].astype(jnp.float32)
    if cfg.moe_topk_method in ("group_limited_greedy", "noaux_tc") \
            and cfg.moe_n_group > 1:
        # deepseek group-limited routing: keep only experts inside the best
        # topk_group of the n_group expert groups (group score = max member
        # for v2, sum of top-2 members for v3's noaux_tc)
        g = cfg.moe_n_group
        cg = choice.reshape(*choice.shape[:-1], g, E // g)
        if cfg.moe_topk_method == "noaux_tc":
            gscore = jnp.sum(jax.lax.top_k(cg, 2)[0], axis=-1)
        else:
            gscore = jnp.max(cg, axis=-1)
        gth = jax.lax.top_k(gscore, cfg.moe_topk_group)[0][..., -1:]
        gmask = gscore >= gth                                    # [b,s,g]
        choice = jnp.where(
            jnp.repeat(gmask, E // g, axis=-1), choice, 0.0)
    topv, _ = jax.lax.top_k(choice, k)
    thresh = topv[..., -1:]
    sel = choice >= thresh                                       # [b, s, E]
    gated = jnp.where(sel, probs, 0.0)
    if cfg.moe_norm_topk:  # mixtral always; qwen2moe/olmoe norm_topk_prob
        gated = gated / jnp.maximum(jnp.sum(gated, axis=-1, keepdims=True),
                                    1e-9)
    if cfg.moe_routed_scale != 1.0:    # deepseek routed_scaling_factor
        gated = gated * cfg.moe_routed_scale
    return _moe_combine(cfg, moe, h, sel, gated, taps, backend)


def _moe_combine(cfg: ModelConfig, moe: Dict[str, Any], h: jax.Array,
                 sel: jax.Array, gated: jax.Array,
                 taps: Optional[Dict[str, jax.Array]], backend: str) -> jax.Array:
    """Combine expert outputs under routing weights ``gated`` [b,s,E]
    (``sel`` the boolean selection mask) — per-expert masked loop or the
    stacked expert-parallel einsum form, plus the always-on shared expert."""

    def shared_expert_out():
        # qwen2_moe: an always-on expert behind a sigmoid scalar gate;
        # deepseek: the same always-on expert added ungated
        sh = moe["shared"]
        if taps is not None:
            taps["moe.shared.gate"] = taps["moe.shared.up"] = h
        a = (_activation(qlinear.apply(sh["gate"], h, backend), cfg.act)
             * qlinear.apply(sh["up"], h, backend))
        if taps is not None:
            taps["moe.shared.down"] = a
        y = qlinear.apply(sh["down"], a, backend)
        if "shared_gate" not in moe:
            return y
        g = jax.nn.sigmoid(
            qlinear.apply(moe["shared_gate"], h, backend).astype(jnp.float32))
        return y * g.astype(y.dtype)

    rows = h.shape[0] * h.shape[1] if h.ndim == 3 else h.shape[0]
    _moe_env = os.environ.get("GANQ_MOE_MEGA", "")
    if ("mega" in moe and backend == "pallas_a8" and taps is None
            and rows <= 32 and _moe_env != "0"
            and (jax.default_backend() != "cpu" or _moe_env == "1")):
        # fused MoE decode kernel (ops/moe_expert.py, VERDICT r4 #5): ONE
        # pallas call streams only the UNION of routed experts' packed
        # tiles — routing (computed here, in XLA) steers the kernel's DMA
        # through its scalar-prefetch slot ids. Slots = top-S experts by
        # total routed mass (S = min(E, rows*topk) covers every token's
        # selection; zero-mass pads contribute nothing).
        from ..ops.moe_expert import moe_expert_decode

        E = gated.shape[-1]
        hv = h.reshape(rows, h.shape[-1])
        gb = gated.reshape(rows, E).astype(jnp.float32)
        S = min(E, rows * cfg.num_experts_per_tok)
        _, slot_ids = jax.lax.top_k(jnp.sum(gb, axis=0), S)
        wts = jnp.take(gb, slot_ids, axis=1)
        bits = moe["experts"][0]["gate"].bits
        y = moe_expert_decode(hv, moe["mega"], slot_ids, wts, bits=bits,
                              act=_fused_act_kind(cfg),
                              interpret=jax.default_backend() == "cpu")
        y = y.reshape(h.shape).astype(h.dtype)
        if "shared" in moe:
            y = y + shared_expert_out().astype(y.dtype)
        return y

    if "stacked" in moe:
        # expert-parallel form (parallel/expert_parallel.py): one einsum per
        # projection with e a real tensor axis. Shard *_w on e over the mesh
        # and each device computes only its local experts; XLA inserts the
        # reduce for the final combine. Unselected experts contribute through
        # a zero routing weight (f_e(h)·0 == f_e(h·0)·w for the masked loop
        # below, so outputs match the per-expert path exactly).
        st = moe["stacked"]

        def _proj(x, key, spec):
            # int8-stacked experts carry a per-row scale applied on the
            # OUTPUT side of the dot (parallel/expert_parallel.py)
            y = jnp.einsum(spec, x, st[f"{key}_w"].astype(x.dtype))
            s = st.get(f"{key}_s")
            return y if s is None else y * s[:, None, None, :].astype(y.dtype)

        g = _proj(h, "gate", "bsh,eih->ebsi")
        u = _proj(h, "up", "bsh,eih->ebsi")
        a = _activation(g, cfg.act) * u
        y = _proj(a, "down", "ebsi,ehi->ebsh")
        y = jnp.einsum("ebsh,bse->bsh", y, gated.astype(y.dtype))
        if "shared" in moe:
            y = y + shared_expert_out()
        return y

    out = jnp.zeros_like(h)
    for e, exp in enumerate(moe["experts"]):
        w_e = gated[..., e:e + 1].astype(h.dtype)                # [b, s, 1]
        x_e = h * (sel[..., e:e + 1]).astype(h.dtype)
        if taps is not None:
            taps[f"moe.experts.{e}.gate"] = x_e
            taps[f"moe.experts.{e}.up"] = x_e
        g = qlinear.apply(exp["gate"], x_e, backend)
        u = qlinear.apply(exp["up"], x_e, backend)
        a = _activation(g, cfg.act) * u
        if taps is not None:
            taps[f"moe.experts.{e}.down"] = a * (sel[..., e:e + 1]).astype(a.dtype)
        out = out + w_e * qlinear.apply(exp["down"], a, backend)
    if "shared" in moe:
        out = out + shared_expert_out()
    return out


def _rms_vec(x: jax.Array, w: jax.Array, eps: float,
             offset: float = 0.0) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)
            * (w.astype(jnp.float32) + offset)).astype(x.dtype)


def _std_qkv(cfg: ModelConfig, lp: Dict[str, Any], h: jax.Array, rope,
             backend: str, taps: Optional[Dict[str, jax.Array]]):
    """Standard q/k/v projections: optional fused qkv, clip, flat/per-head/
    cohere qk norms, rope. Returns q [b,s,Hq,d], k/v [b,s,Hkv,d]."""
    b, s, _ = h.shape
    if taps is not None:
        taps["attn.q"] = taps["attn.k"] = taps["attn.v"] = h
    if "qkv" in lp["attn"]:  # serving-time fusion (one kernel, split after)
        qkv = qlinear.apply(lp["attn"]["qkv"], h, backend)
        # kv width inferred from the fused tensor, not cfg.kv_dim — layers
        # may differ (decilm variable GQA); shapes stay static under jit
        kvd = (qkv.shape[-1] - cfg.q_dim) // 2
        q = qkv[..., :cfg.q_dim]
        k = qkv[..., cfg.q_dim:cfg.q_dim + kvd]
        v = qkv[..., cfg.q_dim + kvd:]
    else:
        q = qlinear.apply(lp["attn"]["q"], h, backend)
        k = qlinear.apply(lp["attn"]["k"], h, backend)
        v = qlinear.apply(lp["attn"]["v"], h, backend)
    if cfg.clip_qkv is not None:  # mpt
        c = cfg.clip_qkv
        q, k, v = (jnp.clip(t, -c, c) for t in (q, k, v))
    if cfg.qk_norm == "flat":
        # olmo2/olmoe: RMSNorm over the full projection dim, pre-reshape
        q = _rms_vec(q, lp["attn"]["q_norm"]["weight"], cfg.norm_eps)
        k = _rms_vec(k, lp["attn"]["k_norm"]["weight"], cfg.norm_eps)
    q = q.reshape(b, s, cfg.num_attention_heads, cfg.head_dim)
    k = k.reshape(b, s, -1, cfg.head_dim)
    v = v.reshape(b, s, -1, cfg.head_dim)

    if cfg.qk_norm in (True, "head"):
        # per-head RMSNorm over head_dim (qwen3; gemma3 adds its (1+w)
        # zero-centered weight via rms_offset): weights [head_dim]
        q = _rms_vec(q, lp["attn"]["q_norm"]["weight"], cfg.norm_eps,
                     cfg.rms_offset)
        k = _rms_vec(k, lp["attn"]["k_norm"]["weight"], cfg.norm_eps,
                     cfg.rms_offset)
    elif cfg.qk_norm == "cohere":
        # cohere use_qk_norm: bias-free LayerNorm over head_dim with a
        # DISTINCT weight per head ([heads, head_dim]), applied pre-rope
        def ch_norm(t, w):
            tf = t.astype(jnp.float32)
            mean = jnp.mean(tf, axis=-1, keepdims=True)
            var = jnp.var(tf, axis=-1, keepdims=True)
            return ((tf - mean) * jax.lax.rsqrt(var + cfg.norm_eps)
                    * w.astype(jnp.float32)[None, None]).astype(t.dtype)
        q = ch_norm(q, lp["attn"]["q_norm"]["weight"])
        k = ch_norm(k, lp["attn"]["k_norm"]["weight"])

    if cfg.pos == "rope":
        cos, sin = rope
        q = apply_rope(q, cos, sin, cfg.rope_interleaved)
        k = apply_rope(k, cos, sin, cfg.rope_interleaved)
    return q, k, v


def _mla_qkv(cfg: ModelConfig, ap: Dict[str, Any], h: jax.Array, rope,
             backend: str, taps: Optional[Dict[str, jax.Array]]):
    """DeepSeek MLA projections (modeling_deepseek_v2.py:352-375): q through
    an optional low-rank bottleneck (q_a -> rmsnorm -> q_b), kv through the
    compressed kv_a (whose tail [qk_rope_head_dim] is the SHARED rope key)
    -> rmsnorm -> kv_b giving per-head k_nope and v. Rope (complex-multiply
    in HF = interleaved pairs) touches only the pe slices. Cache stores the
    assembled per-head k (nope+rope width) and v — correctness-first; the
    compressed-kv absorbed-matmul cache is a later TPU optimization."""
    b, s, _ = h.shape
    H = cfg.num_attention_heads
    nope, rd = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
    if taps is not None:
        taps["attn.kv_a"] = h
    if ap.get("q") is not None:  # v2-lite: no q bottleneck
        if taps is not None:
            taps["attn.q"] = h
        q = qlinear.apply(ap["q"], h, backend)
    else:
        if taps is not None:
            taps["attn.q_a"] = h
        qa = qlinear.apply(ap["q_a"], h, backend)
        qa = _rms_vec(qa, ap["q_a_norm"]["weight"], cfg.norm_eps)
        if taps is not None:
            taps["attn.q_b"] = qa
        q = qlinear.apply(ap["q_b"], qa, backend)
    q = q.reshape(b, s, H, nope + rd)
    q_nope, q_pe = q[..., :nope], q[..., nope:]

    ckv = qlinear.apply(ap["kv_a"], h, backend)     # [b,s, kv_lora + rd]
    c, k_pe = ckv[..., :cfg.kv_lora_rank], ckv[..., cfg.kv_lora_rank:]
    cn = _rms_vec(c, ap["kv_a_norm"]["weight"], cfg.norm_eps)
    if taps is not None:
        taps["attn.kv_b"] = cn
    kv = qlinear.apply(ap["kv_b"], cn, backend)
    kv = kv.reshape(b, s, H, nope + cfg.v_head_dim)
    k_nope, v = kv[..., :nope], kv[..., nope:]

    cos, sin = rope
    q_pe = apply_rope(q_pe, cos, sin, interleaved=True)
    k_pe = apply_rope(k_pe[:, :, None, :], cos, sin, interleaved=True)
    k = jnp.concatenate(
        [k_nope, jnp.broadcast_to(k_pe, (b, s, H, rd))], axis=-1)
    # cn/k_pe are returned for the compressed (absorbed-matmul) KV cache:
    # per token only kv_lora_rank + rope_dim floats instead of
    # heads*(nope+rope+v) — the deepseek MLA serving memory win
    return (jnp.concatenate([q_nope, q_pe], axis=-1), k, v,
            cn, k_pe[:, :, 0, :])


def _mla_absorbed_attention(cfg: ModelConfig, ab: Dict[str, jax.Array],
                            q: jax.Array, c_all: jax.Array,
                            kpe_all: jax.Array, mask: Optional[jax.Array],
                            scale: float) -> jax.Array:
    """Decode attention over the COMPRESSED MLA cache via absorbed matmuls.

    Identity: k_nope[h] = W_uk[h] @ c and v[h] = W_uv[h] @ c (the per-head
    splits of kv_b), so
      q_nope . k_nope[h]  =  (q_nope @ W_uk[h]) . c        ("q absorption")
      probs . v[h]        =  W_uv[h] @ (probs . c)         ("out absorption")
    Per decoded token this reads rank+rope_dim cache floats instead of
    heads*(nope+rope+v) — the HBM-bandwidth win that motivates MLA. The
    rope scores ride the shared single-head k_pe (MQA-style).

    q [b,s,H,nope+rd]; c_all [b,t,rank]; kpe_all [b,t,rd];
    ab["uk"] [H,nope,rank], ab["uv"] [H,v,rank]. Returns [b,s,H,v]."""
    nope = cfg.qk_nope_head_dim
    q_nope, q_pe = q[..., :nope], q[..., nope:]
    c = c_all.astype(q.dtype)
    qc = jnp.einsum("bshn,hnr->bshr", q_nope, ab["uk"].astype(q.dtype))
    logits = (jnp.einsum("bshr,btr->bhst", qc, c)
              + jnp.einsum("bshd,btd->bhst", q_pe, kpe_all.astype(q.dtype))
              ).astype(jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(c.dtype)
    ctx = jnp.einsum("bhst,btr->bshr", probs, c)
    return jnp.einsum("bshr,hvr->bshv", ctx, ab["uv"].astype(q.dtype))


def absorb_mla_params(cfg: ModelConfig, params: Dict[str, Any]) -> Dict[str, Any]:
    """Serving-time MLA preparation: materialize kv_b's per-head k/v blocks
    as the absorbed operands ``attn.absorb = {uk [H,nope,rank],
    uv [H,v,rank]}``. Quantized kv_b is dequantized once here (a load-time
    repack, like the reference's marlin repack) — the absorbed decode path
    then runs dense einsums against the compressed cache."""
    from ..ops import qlinear as _ql

    H, nope, v = (cfg.num_attention_heads, cfg.qk_nope_head_dim,
                  cfg.v_head_dim)
    layers = []
    for lp in params["layers"]:
        lp = dict(lp)
        a = dict(lp["attn"])
        w = _ql.dequantize_weight(a["kv_b"])        # [H*(nope+v), rank]
        w = w.reshape(H, nope + v, -1)
        a["absorb"] = {"uk": w[:, :nope], "uv": w[:, nope:]}
        lp["attn"] = a
        layers.append(lp)
    return {**params, "layers": layers}


def _cache_write_vec(buf: jax.Array, new: jax.Array, pos: jax.Array,
                     s: int) -> jax.Array:
    """Scatter ``new`` [b, s, ...] into ``buf`` [b, T, ...] at *per-batch*
    start positions ``pos`` [b] (continuous-batching slot decode, where every
    slot sits at its own sequence offset). Expressed as a gather + select so
    XLA lowers it without a serial scatter."""
    T = buf.shape[1]
    off = jnp.arange(T)[None, :] - pos[:, None]            # [b, T]
    sel = (off >= 0) & (off < s)
    idx = jnp.clip(off, 0, s - 1)
    extra = (1,) * (buf.ndim - 2)
    gathered = jnp.take_along_axis(new, idx.reshape(idx.shape + extra), axis=1)
    return jnp.where(sel.reshape(sel.shape + extra),
                     gathered.astype(buf.dtype), buf)



def _rope_half_tables(cfg: ModelConfig, rope):
    """Half-dim cos/sin rows at the current decode position for the fused
    kernels (rotate-half uses the first half; interleaved uses even lanes)."""
    rd = cfg.rotary_dim or cfg.head_dim
    cos, sin = rope
    if cfg.rope_interleaved:
        return rd, cos[0, 0, 0::2], sin[0, 0, 0::2]
    return rd, cos[0, 0, :rd // 2], sin[0, 0, :rd // 2]


def _rope_half_tables_vec(cfg: ModelConfig, rope):
    """Per-row variant of :func:`_rope_half_tables`: [B, half] tables for
    kernels whose batch rows sit at DIFFERENT positions (continuous
    batching through the megastep)."""
    rd = cfg.rotary_dim or cfg.head_dim
    cos, sin = rope
    if cfg.rope_interleaved:
        return rd, cos[:, 0, 0::2], sin[:, 0, 0::2]
    return rd, cos[:, 0, :rd // 2], sin[:, 0, :rd // 2]


def _fused_act_kind(cfg: ModelConfig) -> str:
    """cfg.act -> the fused-MLP kernel's activation name."""
    if cfg.act == "silu":
        return "silu"
    if "tanh" in cfg.act or cfg.act == "gelu_new":
        return "gelu_tanh"
    return "gelu"


def _hymba_layer(cfg: ModelConfig, lp: Dict[str, Any], x: jax.Array,
                 mask, rope, cache, cache_pos, want_taps: bool,
                 backend: str, kv_override=None):
    """Hymba hybrid-head decoder layer (reference
    models/definitions/hymba.py declares the arch and quantizes
    mamba.in_proj / mamba.out_proj / the single-expert MLP; the block
    structure follows the Hymba paper, NVIDIA 2024): ONE fused in_proj
    emits the SSM stream (x, z) AND the attention q/k/v on the same normed
    input; the two branch outputs are RMS-normed and averaged before
    out_proj. The SSM math is ops/ssm.py (lax.scan selective state space);
    attention is the standard GQA path with rope and KV cache.

    ``kv_override``: another layer's (already updated) {"k","v"} cache —
    hymba's cross-layer KV sharing (cfg.kv_reuse_map). The consumer layer
    attends over the producer's keys/values; its own cache rows and the
    k/v sections of its in_proj output are unused.

    Scope notes (recorded, not silent): scalar cache positions only (no
    continuous-batching vector positions) and no sliding-window overlay.
    The quantization looper calibrates consumer layers on the PRODUCER's
    k/v (quant/looper.py threads kv_override — the reference's shared-KV
    calibration semantics, module_looper.py:305-313); GANQ_HYMBA_OWNKV=1
    restores own-KV calibration for A/B.
    """
    from ..ops.ssm import causal_conv1d, selective_scan

    taps: Dict[str, jax.Array] = {}
    b, s, H = x.shape
    d = cfg.head_dim
    Hq = cfg.num_attention_heads
    scale = (cfg.attn_scale if cfg.attn_scale is not None
             else 1.0 / math.sqrt(d))
    # vector cache_pos = per-slot positions (continuous batching): the
    # k/v writes scatter per row (_cache_write_vec) and the caller's mask
    # carries per-slot validity; the SSM/conv streaming state is
    # position-free by construction (round 5 — closes the r4 scope note)
    vec_pos = (cache_pos is not None and not isinstance(cache_pos, int)
               and getattr(cache_pos, "ndim", 0) == 1)
    residual = x
    h = apply_norm(lp["input_norm"], x, cfg.norm, cfg.norm_eps,
                   cfg.rms_offset)
    mp = lp["mamba"]
    if want_taps:
        taps["mamba.in_proj"] = h
    proj = qlinear.apply(mp["in_proj"], h, backend) \
        if isinstance(mp["in_proj"], qlinear.QLinear) else \
        (h @ mp["in_proj"]["weight"].T.astype(h.dtype))
    Di = mp["A_log"].shape[0]
    q_dim = Hq * d
    kvd = (proj.shape[-1] - 2 * Di - q_dim) // 2
    xs, z = proj[..., :Di], proj[..., Di:2 * Di]
    qf = proj[..., 2 * Di:2 * Di + q_dim]
    kf = proj[..., 2 * Di + q_dim:2 * Di + q_dim + kvd]
    vf = proj[..., 2 * Di + q_dim + kvd:]

    # ---- SSM branch (streaming state rides the cache)
    conv_state = None if cache is None else cache["conv"]
    xs, conv_new = causal_conv1d(xs, mp["conv_w"], mp.get("conv_b"),
                                 conv_state)
    xs = jax.nn.silu(xs.astype(jnp.float32)).astype(proj.dtype)
    dbc = xs @ mp["x_proj"]["weight"].T.astype(xs.dtype)
    dt_rank = dbc.shape[-1] - 2 * cfg.ssm_state
    dt = dbc[..., :dt_rank] @ mp["dt_proj"]["weight"].T.astype(dbc.dtype)
    dt = jax.nn.softplus(dt.astype(jnp.float32)
                         + mp["dt_proj"]["bias"].astype(jnp.float32))
    Bc = dbc[..., dt_rank:dt_rank + cfg.ssm_state]
    Cc = dbc[..., dt_rank + cfg.ssm_state:]
    h0 = None if cache is None else cache["ssm"]
    y_ssm, hT = selective_scan(xs, dt, mp["A_log"], Bc, Cc, mp["D"],
                               z=z, h0=h0)
    y_ssm = _rms_vec(y_ssm, mp["ssm_norm"]["weight"], cfg.norm_eps)

    # ---- attention branch
    q = qf.reshape(b, s, Hq, d)
    k = kf.reshape(b, s, -1, d)
    v = vf.reshape(b, s, -1, d)
    if cfg.pos == "rope" and rope is not None:
        cos, sin = rope
        q = apply_rope(q, cos, sin, cfg.rope_interleaved)
        k = apply_rope(k, cos, sin, cfg.rope_interleaved)
    is_prefill = cache is None or (isinstance(cache_pos, int)
                                   and cache_pos == 0 and s > 1)
    own_kv = None
    if cache is not None and kv_override is None:
        if vec_pos:
            ck = _cache_write_vec(cache["k"], k, cache_pos, s)
            cv = _cache_write_vec(cache["v"], v, cache_pos, s)
        else:
            ck = jax.lax.dynamic_update_slice(
                cache["k"], k.astype(cache["k"].dtype), (0, cache_pos, 0, 0))
            cv = jax.lax.dynamic_update_slice(
                cache["v"], v.astype(cache["v"].dtype), (0, cache_pos, 0, 0))
        own_kv = (ck, cv)
    if kv_override is not None:
        k_att = kv_override["k"].astype(q.dtype)
        v_att = kv_override["v"].astype(q.dtype)
        att_mask = mask if not is_prefill else causal_mask(s, k_att.shape[1])
    elif is_prefill:
        k_att, v_att = k.astype(q.dtype), v.astype(q.dtype)
        att_mask = causal_mask(s, s)
    else:
        k_att, v_att = own_kv[0].astype(q.dtype), own_kv[1].astype(q.dtype)
        att_mask = mask
    y_attn = attention(q, k_att, v_att, att_mask, scale).reshape(b, s, -1)
    y_attn = _rms_vec(y_attn, mp["attn_norm"]["weight"], cfg.norm_eps)

    ymix = 0.5 * (y_attn.astype(jnp.float32)
                  + y_ssm.astype(jnp.float32)).astype(x.dtype)
    if want_taps:
        taps["mamba.out_proj"] = ymix
    out = qlinear.apply(mp["out_proj"], ymix, backend) \
        if isinstance(mp["out_proj"], qlinear.QLinear) else \
        (ymix @ mp["out_proj"]["weight"].T.astype(ymix.dtype))
    x = residual + out

    # ---- standard gated MLP (reference quantizes it as moe.experts.0.*)
    h2 = apply_norm(lp["post_norm"], x, cfg.norm, cfg.norm_eps,
                    cfg.rms_offset)
    if want_taps:
        taps["mlp.gate"] = taps["mlp.up"] = h2
    g = qlinear.apply(lp["mlp"]["gate"], h2, backend)
    u = qlinear.apply(lp["mlp"]["up"], h2, backend)
    a = _activation(g, cfg.act) * u
    if want_taps:
        taps["mlp.down"] = a
    x = x + qlinear.apply(lp["mlp"]["down"], a, backend)

    if cache is not None:
        new_cache = {"k": own_kv[0] if own_kv is not None else cache["k"],
                     "v": own_kv[1] if own_kv is not None else cache["v"],
                     "conv": conv_new, "ssm": hT}
    else:
        # cache-free forward still exposes this layer's fresh k/v so
        # forward() can thread kv_reuse to consumer layers
        new_cache = {"k": k, "v": v, "conv": conv_new, "ssm": hT}
    return x, new_cache, taps


def layer_forward(cfg: ModelConfig, lp: Dict[str, Any], x: jax.Array,
                  mask: Optional[jax.Array],
                  rope: Optional[Tuple[jax.Array, jax.Array]] = None,
                  cache: Optional[Dict[str, jax.Array]] = None,
                  cache_pos: Optional[jax.Array] = None,
                  want_taps: bool = False,
                  backend: str = "reference",
                  window: Optional[Any] = None,
                  kv_override: Optional[Dict[str, jax.Array]] = None):
    """One decoder layer. Returns (y, new_cache, taps).

    ``taps`` maps reference-convention submodule names to their *inputs*
    (the tensors the Hessian is accumulated from).

    ``window``: sliding-attention window for THIS layer — None (full), a
    python int (static, unrolled callers via ``cfg.layer_window(i)``), or a
    traced int32 scalar (stacked-scan callers, where per-layer windows ride
    the scan as data so the layer body stays homogeneous).
    """
    if cfg.ssm_hybrid:
        return _hymba_layer(cfg, lp, x, mask, rope, cache, cache_pos,
                            want_taps, backend, kv_override)
    taps: Dict[str, jax.Array] = {}
    b, s, _ = x.shape
    scale = cfg.attn_scale if cfg.attn_scale is not None else 1.0 / math.sqrt(cfg.head_dim)

    # Fused attention-half decode fast path (ops/fused_attention.py): one
    # kernel for norm+qkv+rope, one flash kernel for GQA cache attention —
    # collapses ~20 small XLA ops per layer at decode (PERF.md). Gated to
    # the scalar-position single-token w8a8 serving shape.
    _plain_decode = (cache is not None and "k" in cache and s == 1
                     and b <= 64 and not want_taps and not cfg.mla
                     and cache_pos is not None
                     and not isinstance(cache_pos, int)
                     and getattr(cache_pos, "ndim", None) == 0
                     and cfg.pos != "alibi" and cfg.attn_softcap is None
                     and window is None and cfg.head_dim <= 128)
    # Fully-fused decode layer: ONE attention-half megakernel
    # (norm+qkv+rope+flash+o+residual, ops/fused_layer.py) + ONE fused-MLP
    # kernel — 2 pallas calls per layer. OPT-IN (GANQ_FUSED_LAYER=1): on
    # this environment's runtime the megakernel's sequential ("arbitrary")
    # 24-step grid costs more than the 3 parallel-grid kernels it replaces
    # (~267 vs ~183 us/layer, PERF.md round-1 addendum); it exists for
    # directly-attached hardware, where removing the qkv/attention HBM
    # intermediates is the same win the fused MLP delivered.
    if (_plain_decode and b <= 8 and backend == "pallas_a8"
            and cfg.pos == "rope"
            and cfg.head_dim == 128 and cfg.gated_mlp and "moe" not in lp
            and "gateup" in lp.get("mlp", {}) and "o_t_w8" in lp.get("attn", {})
            and lp["mlp"]["gateup"].kind == "w8"
            and lp["mlp"]["down"].kind == "w8"
            and "lora_a" not in lp["mlp"]["gateup"].arrays
            and "lora_a" not in lp["mlp"]["down"].arrays
            and os.environ.get("GANQ_FUSED_LAYER", "0") == "1"):
        from ..ops.fused_layer import attn_half_decode_w8a8, attn_half_fusable
        if attn_half_fusable(cfg, lp):
            from ..ops.fused_mlp import fused_mlp_w8a8
            ap = lp["attn"]["qkv"]
            kvd = (ap["w8"].shape[0] - cfg.q_dim) // 2
            rd, cos_h, sin_h = _rope_half_tables(cfg, rope)
            y, k_new, v_new = attn_half_decode_w8a8(
                x[:, 0, :], lp["input_norm"]["weight"], ap["w8"], ap["scale"],
                ap.arrays.get("bias"), lp["attn"]["o_t_w8"],
                lp["attn"]["o_t_scale"], cos_h, sin_h,
                cache["k"], cache["v"], cache_pos,
                q_dim=cfg.q_dim, kv_dim=kvd, head_dim=cfg.head_dim,
                rotary_dim=rd, interleaved=cfg.rope_interleaved,
                eps=cfg.norm_eps, rms_offset=cfg.rms_offset, scale=scale)
            new_cache = {
                "k": jax.lax.dynamic_update_slice(
                    cache["k"], k_new[:, None].astype(cache["k"].dtype),
                    (0, cache_pos, 0, 0)),
                "v": jax.lax.dynamic_update_slice(
                    cache["v"], v_new[:, None].astype(cache["v"].dtype),
                    (0, cache_pos, 0, 0)),
            }
            gu, dn = lp["mlp"]["gateup"], lp["mlp"]["down"]
            act_kind = _fused_act_kind(cfg)
            out = fused_mlp_w8a8(y[:, None, :], gu["w8"], gu["scale"],
                                 dn["w8"], dn["scale"], act=act_kind,
                                 norm_w=lp["post_norm"]["weight"],
                                 eps=cfg.norm_eps, rms_offset=cfg.rms_offset)
            return out, new_cache, taps

    # fused norm+qkv+rope kernel: measured perf-NEUTRAL-to-slightly-negative
    # on this tunneled chip (XLA already fuses the small ops it absorbs;
    # see PERF.md round-1 addendum) — parity-complete, opt-in via env
    use_fused_attn = False
    if (_plain_decode and backend == "pallas_a8"
            and "qkv" in lp["attn"] and lp["attn"]["qkv"].kind == "w8"
            and "lora_a" not in lp["attn"]["qkv"].arrays
            and cfg.clip_qkv is None and not cfg.qk_norm
            and cfg.norm == "rmsnorm" and cfg.do_layer_norm_before
            and not cfg.norm_after_sublayer and cfg.pos == "rope"
            and os.environ.get("GANQ_FUSED_QKV", "0") != "0"):
        from ..ops.fused_attention import qkv_fusable_tile
        kvd = (lp["attn"]["qkv"]["w8"].shape[0] - cfg.q_dim) // 2
        use_fused_attn = qkv_fusable_tile(cfg.q_dim, kvd,
                                          cfg.head_dim) is not None
    # flash decode attention: one kernel over the cache with online softmax;
    # skips compute for blocks beyond the current position (long-context win).
    # Default on for real TPU; off on the CPU backend (Mosaic kernels do not
    # lower there) unless GANQ_FLASH_DECODE=1 forces it (interpret-mode tests)
    _flash_env = os.environ.get("GANQ_FLASH_DECODE", "")
    use_flash_decode = (_plain_decode and backend in ("pallas", "pallas_a8")
                        and (_flash_env == "1"
                             or (_flash_env != "0"
                                 and jax.default_backend() != "cpu")))

    residual = x
    if cfg.norm_after_sublayer or not cfg.do_layer_norm_before:
        h = x
    elif use_fused_attn:
        h = x                     # rmsnorm folded into the fused qkv kernel
    else:
        h = apply_norm(lp["input_norm"], x, cfg.norm, cfg.norm_eps, cfg.rms_offset)
    cn = kpe = None
    if use_fused_attn:
        from ..ops.fused_attention import fused_qkv_rope_w8a8
        ap = lp["attn"]["qkv"]
        rd, cos_h, sin_h = _rope_half_tables(cfg, rope)
        qkv_flat = fused_qkv_rope_w8a8(
            x[:, 0, :], lp["input_norm"]["weight"], ap["w8"], ap["scale"],
            ap.arrays.get("bias"), cos_h, sin_h,
            q_dim=cfg.q_dim, kv_dim=kvd, head_dim=cfg.head_dim,
            rotary_dim=rd, interleaved=cfg.rope_interleaved,
            eps=cfg.norm_eps, rms_offset=cfg.rms_offset, fold_norm=True)
        q = qkv_flat[:, None, :cfg.q_dim].reshape(
            b, 1, cfg.num_attention_heads, cfg.head_dim)
        k = qkv_flat[:, None, cfg.q_dim:cfg.q_dim + kvd].reshape(
            b, 1, -1, cfg.head_dim)
        v = qkv_flat[:, None, cfg.q_dim + kvd:].reshape(
            b, 1, -1, cfg.head_dim)
    elif cfg.mla:
        q, k, v, cn, kpe = _mla_qkv(cfg, lp["attn"], h, rope, backend,
                                    taps if want_taps else None)
    else:
        q, k, v = _std_qkv(cfg, lp, h, rope, backend,
                           taps if want_taps else None)
    # Static prefill detection: call sites pass a python-int 0 for prefill
    # and a traced position for decode. Prefilling from position 0 attends
    # only over the freshly computed k/v (mathematically identical to the
    # masked full-cache product, and flash-attention eligible).
    is_prefill = cache is None or (isinstance(cache_pos, int) and cache_pos == 0
                                   and s > 1)
    # MLA compressed cache (cache structure decides, statically under jit):
    # store the shared post-norm compressed kv + rotated rope key instead of
    # assembled per-head k/v; decode reads it via absorbed matmuls
    mla_compressed = cache is not None and "c" in cache
    # vector cache_pos = per-batch slot positions (continuous batching);
    # scalar/int = all rows at the same position (single-sequence engine)
    vec_pos = (cache_pos is not None and not isinstance(cache_pos, int)
               and getattr(cache_pos, "ndim", 0) == 1)
    if mla_compressed:
        if vec_pos:
            cc = _cache_write_vec(cache["c"], cn, cache_pos, s)
            ckpe = _cache_write_vec(cache["kpe"], kpe, cache_pos, s)
        else:
            cc = jax.lax.dynamic_update_slice(
                cache["c"], cn.astype(cache["c"].dtype), (0, cache_pos, 0))
            ckpe = jax.lax.dynamic_update_slice(
                cache["kpe"], kpe.astype(cache["kpe"].dtype), (0, cache_pos, 0))
        new_cache = {"c": cc, "kpe": ckpe}
    elif cache is not None:
        if vec_pos:
            ck = _cache_write_vec(cache["k"], k, cache_pos, s)
            cv = _cache_write_vec(cache["v"], v, cache_pos, s)
        else:
            ck = jax.lax.dynamic_update_slice(cache["k"], k.astype(cache["k"].dtype), (0, cache_pos, 0, 0))
            cv = jax.lax.dynamic_update_slice(cache["v"], v.astype(cache["v"].dtype), (0, cache_pos, 0, 0))
        new_cache = {"k": ck, "v": cv}
    else:
        new_cache = None

    alibi = None
    if cfg.pos == "alibi":
        T = (new_cache["k"].shape[1] if (new_cache is not None and not is_prefill)
             else k.shape[1])
        alibi = (alibi_slopes(cfg.num_attention_heads, cfg.alibi_kind)[:, None]
                 * jnp.arange(T, dtype=jnp.float32)[None, :])  # [hq, T]

    def _window_overlay(T: int) -> jax.Array:
        # key j visible to query at absolute position p iff j > p - window
        if vec_pos:  # per-batch positions -> [b, 1, s, T]
            qpos = jnp.arange(s)[None, :] + cache_pos[:, None]
            return (jnp.arange(T)[None, None, :]
                    > qpos[:, :, None] - window)[:, None]
        qpos = jnp.arange(s) + (cache_pos if cache_pos is not None else 0)
        return (jnp.arange(T)[None, :] > qpos[:, None] - window)[None, None]

    # flash prefill stays valid under a *static* window >= s (mask identical
    # to plain causal); softcap, traced windows, and MLA's asymmetric k/v
    # head dims need the masked path
    flash_ok = (alibi is None and cfg.attn_softcap is None and not cfg.mla
                and (window is None or (isinstance(window, int)
                                        and s <= window)))
    if use_flash_decode:
        from ..ops.fused_attention import flash_decode_attention
        attn_out = flash_decode_attention(
            q[:, 0], new_cache["k"], new_cache["v"], cache_pos,
            scale)[:, None]
    elif mla_compressed and not is_prefill:
        attn_out = _mla_absorbed_attention(cfg, lp["attn"]["absorb"], q,
                                           new_cache["c"], new_cache["kpe"],
                                           mask, scale)
    elif is_prefill and flash_ok:
        from ..ops.attention import flash_attention
        attn_out = flash_attention(q, k.astype(q.dtype), v.astype(q.dtype),
                                   scale, causal=True)
    elif is_prefill:
        pre_mask = causal_mask(s, k.shape[1])
        if window is not None:
            pre_mask = pre_mask & _window_overlay(k.shape[1])
        attn_out = attention(q, k.astype(q.dtype), v.astype(q.dtype),
                             pre_mask, scale, bias=alibi,
                             softcap=cfg.attn_softcap)
    else:
        k_all = new_cache["k"].astype(q.dtype)
        v_all = new_cache["v"].astype(q.dtype)
        if window is not None:
            mask = mask & _window_overlay(k_all.shape[1])
        attn_out = attention(q, k_all, v_all, mask, scale, bias=alibi,
                             softcap=cfg.attn_softcap)
    attn_out = attn_out.reshape(b, s, -1)   # heads * v dim (MLA: v_head_dim)
    if want_taps:
        taps["attn.o"] = attn_out
    attn_out = qlinear.apply(lp["attn"]["o"], attn_out, backend)
    if cfg.sandwich_norm:
        # gemma2: the attn output is normed before the residual add
        attn_out = apply_norm(lp["post_attn_norm"], attn_out, cfg.norm,
                              cfg.norm_eps, cfg.rms_offset)
    if cfg.norm_after_sublayer:
        # olmo2: x += post_attention_layernorm(attn_out)
        x = residual + apply_norm(lp["input_norm"], attn_out, cfg.norm,
                                  cfg.norm_eps, cfg.rms_offset)
        residual = x
        h = x
    elif cfg.parallel_residual:
        # gpt-neox: x_out = x + attn(ln1 x) + mlp(ln2 x)
        h = apply_norm(lp["post_norm"], x, cfg.norm, cfg.norm_eps, cfg.rms_offset)
        residual = residual + attn_out
    else:
        if cfg.residual_multiplier is not None:  # granite
            attn_out = attn_out * cfg.residual_multiplier
        x = residual + attn_out
        if not cfg.do_layer_norm_before:
            x = apply_norm(lp["input_norm"], x, cfg.norm, cfg.norm_eps, cfg.rms_offset)
        residual = x
        h = apply_norm(lp["post_norm"], x, cfg.norm, cfg.norm_eps, cfg.rms_offset) if cfg.do_layer_norm_before else x
    if "moe" in lp:
        mlp_out = _moe_forward(cfg, lp["moe"], h, taps if want_taps else None,
                               backend)
    elif cfg.gated_mlp:
        if want_taps:
            taps["mlp.gate"] = taps["mlp.up"] = h
        if ("gateup" in lp["mlp"] and backend == "pallas_a8"
                and lp["mlp"]["gateup"].kind == "w8"
                and lp["mlp"]["down"].kind == "w8"
                and not cfg.norm_after_sublayer  # kernel norms input, not output
                and not cfg.sandwich_norm        # ...and has no output norm
                and cfg.residual_multiplier is None  # kernel adds unscaled
                and b * s <= 64):  # decode-shaped; prefill uses w8a8 matmuls
            # whole-MLP megakernel: norm + gate/up + act + down + residual
            # in one op instead of ~eight (ops/fused_mlp.py)
            from ..ops.fused_mlp import fused_mlp_w8a8
            gu, dn = lp["mlp"]["gateup"], lp["mlp"]["down"]
            act_kind = _fused_act_kind(cfg)
            if cfg.do_layer_norm_before and cfg.norm == "rmsnorm":
                # h was not consumed: fold norm + residual into the kernel
                x = fused_mlp_w8a8(residual, gu["w8"], gu["scale"],
                                   dn["w8"], dn["scale"], act=act_kind,
                                   norm_w=lp["post_norm"]["weight"],
                                   eps=cfg.norm_eps,
                                   rms_offset=cfg.rms_offset)
            else:
                mlp_out = fused_mlp_w8a8(h, gu["w8"], gu["scale"],
                                         dn["w8"], dn["scale"], act=act_kind)
                x = residual + mlp_out
                if not cfg.do_layer_norm_before:
                    x = apply_norm(lp["post_norm"], x, cfg.norm, cfg.norm_eps, cfg.rms_offset)
            return x, new_cache, taps
        if "gateup" in lp["mlp"]:
            gu = qlinear.apply(lp["mlp"]["gateup"], h, backend)
            g, u = gu[..., :cfg.intermediate_size], gu[..., cfg.intermediate_size:]
        else:
            g = qlinear.apply(lp["mlp"]["gate"], h, backend)
            u = qlinear.apply(lp["mlp"]["up"], h, backend)
        a = _activation(g, cfg.act) * u
        if want_taps:
            taps["mlp.down"] = a
        mlp_out = qlinear.apply(lp["mlp"]["down"], a, backend)
    else:
        if want_taps:
            taps["mlp.up"] = h
        a = _activation(qlinear.apply(lp["mlp"]["up"], h, backend), cfg.act)
        if want_taps:
            taps["mlp.down"] = a
        mlp_out = qlinear.apply(lp["mlp"]["down"], a, backend)
    if cfg.norm_after_sublayer:
        # olmo2: x += post_feedforward_layernorm(mlp_out)
        x = residual + apply_norm(lp["post_norm"], mlp_out, cfg.norm,
                                  cfg.norm_eps, cfg.rms_offset)
        return x, new_cache, taps
    if cfg.sandwich_norm:
        # gemma2: the mlp output is normed before the residual add
        mlp_out = apply_norm(lp["post_mlp_norm"], mlp_out, cfg.norm,
                             cfg.norm_eps, cfg.rms_offset)
    if cfg.residual_multiplier is not None:  # granite
        mlp_out = mlp_out * cfg.residual_multiplier
    x = residual + mlp_out
    if not cfg.do_layer_norm_before:
        x = apply_norm(lp["post_norm"], x, cfg.norm, cfg.norm_eps, cfg.rms_offset)

    return x, new_cache, taps


# ------------------------------------------------------------------ embedding
def embed(cfg: ModelConfig, params: Dict[str, Any], input_ids: jax.Array,
          positions: jax.Array) -> jax.Array:
    x = params["embed_tokens"]["weight"][input_ids]
    if cfg.embed_scale is not None:
        x = x * jnp.asarray(cfg.embed_scale, x.dtype)
    if cfg.embed_norm and "embed_norm" in params:
        x = apply_norm(params["embed_norm"], x, "layernorm", cfg.norm_eps)
    if "project_in" in params:
        x = qlinear.apply(params["project_in"], x)
    if cfg.pos == "learned":
        x = x + params["embed_positions"]["weight"][positions + cfg.pos_offset]
    return x


def unembed(cfg: ModelConfig, params: Dict[str, Any], x: jax.Array,
            backend: str = "reference") -> jax.Array:
    if cfg.final_layer_norm and "final_norm" in params:
        x = apply_norm(params["final_norm"], x, cfg.norm, cfg.norm_eps, cfg.rms_offset)
    if "project_out" in params:
        x = qlinear.apply(params["project_out"], x)
    lm = params.get("lm_head")
    if lm is None:
        w = params["embed_tokens"]["weight"]
        logits = jnp.dot(x, w.T.astype(x.dtype))
    else:
        # a quantized lm_head through the fused kernels streams the packed
        # weights; the XLA reference materializes the dequantized [V, H]
        # matrix, erasing the read-bandwidth win. Keep logits in full
        # activation precision ("pallas" w8 path keeps x bf16; a8 would
        # quantize the final activations and perturb logits).
        lm_backend = "pallas" if backend in ("pallas", "pallas_a8") else backend
        logits = qlinear.apply(lm, x, backend=lm_backend)
    if cfg.logit_scale is not None:  # cohere multiplier / granite 1/scaling
        logits = logits * jnp.asarray(cfg.logit_scale, logits.dtype)
    if cfg.logit_softcap is not None:
        cap = cfg.logit_softcap
        logits = (cap * jnp.tanh(logits.astype(jnp.float32) / cap)).astype(logits.dtype)
    return logits


def forward(cfg: ModelConfig, params: Dict[str, Any], input_ids: jax.Array,
            backend: str = "reference") -> jax.Array:
    """Full forward, no cache: input_ids [b, s] -> logits [b, s, vocab].
    Hymba extras handled here: meta tokens are prepended (their logit rows
    are stripped, so the [b, s, vocab] contract holds) and kv_reuse
    consumer layers read the producer layer's fresh k/v."""
    b, s = input_ids.shape
    m = cfg.num_meta_tokens
    positions = jnp.broadcast_to(jnp.arange(s) + m, (b, s))
    x = embed(cfg, params, input_ids, positions)
    if m:
        meta = params["meta_tokens"].astype(x.dtype)      # [m, H]
        x = jnp.concatenate(
            [jnp.broadcast_to(meta[None], (b, m, meta.shape[1])), x], axis=1)
        positions = jnp.broadcast_to(jnp.arange(s + m), (b, s + m))
    mask = causal_mask(s + m, s + m)
    rope = rope_tables_all(cfg, positions) if cfg.pos == "rope" else None
    lcs = []
    for i, lp in enumerate(params["layers"]):
        ko = None
        if cfg.kv_reuse_map is not None and cfg.kv_reuse_map[i] != i:
            src = lcs[cfg.kv_reuse_map[i]]
            ko = {"k": src["k"], "v": src["v"]}
        x, lc, _ = layer_forward(cfg, lp, x, mask,
                                 rope_for_layer(cfg, rope, i), backend=backend,
                                 window=cfg.layer_window(i), kv_override=ko)
        lcs.append(lc)
    if m:
        x = x[:, m:]
    return unembed(cfg, params, x)


__all__ = ["ModelConfig", "layer_forward", "forward", "embed", "unembed",
           "apply_norm", "rope_tables", "apply_rope", "attention",
           "causal_mask", "alibi_slopes"]
