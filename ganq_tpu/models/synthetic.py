"""Synthetic model builders: random-weight models in any quantization format.

Used by benchmarks and the driver entry points — this environment has no
model downloads, so perf work runs on random weights at real architecture
shapes (identical compute/memory behavior to trained weights).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import qlinear
from .transformer import ModelConfig


def llama_config(hidden: int = 2048, inter: int = 5504, layers: int = 16,
                 heads: int = 16, kv_heads: int = 8, vocab: int = 32000,
                 max_pos: int = 4096) -> ModelConfig:
    return ModelConfig(
        model_type="llama", vocab_size=vocab, hidden_size=hidden,
        intermediate_size=inter, num_hidden_layers=layers,
        num_attention_heads=heads, num_key_value_heads=kv_heads,
        head_dim=hidden // heads, max_position_embeddings=max_pos,
        norm="rmsnorm", act="silu", gated_mlp=True, pos="rope",
        tie_word_embeddings=True)


import functools


@functools.partial(jax.jit, static_argnames=("out_f", "in_f", "kind",
                                             "dtype", "bits"))
def _rand_arrays(key, out_f: int, in_f: int, kind: str, dtype=jnp.bfloat16,
                 bits: int = 4):
    """Array leaves for one random linear, as ONE jitted dispatch — eager
    per-op dispatch through the tunneled runtime costs ~25ms each, which
    made multi-GB synthetic model builds take minutes."""
    from ..ops.packing import pack_int_rows

    if kind == "dense":
        return {"weight": jax.random.normal(key, (out_f, in_f), dtype) * 0.02}
    if kind == "lut":
        k1, k2 = jax.random.split(key)
        V = 1 << bits              # bits=3: the 8-entry walsh-served LUT
        # 0.006: matches the uniform kind's dequantized-weight std, so
        # activation magnitudes (and the absolute kernel-parity
        # tolerances calibrated on the uniform kind) stay comparable
        lut = jnp.sort(
            jax.random.normal(k1, (out_f, V), jnp.float32) * 0.006,
            axis=1).astype(jnp.bfloat16)
        idx = jax.random.randint(k2, (out_f, in_f), 0, V, jnp.int32)
        return {"lut": lut, "idx_packed": pack_int_rows(idx, bits)}
    if kind in ("lut_affine", "lut_affine_sym"):
        # LUT artifact whose per-row codebook lies on an affine grid —
        # exactly what a ganq_codebook="affine"/"affine_sym" solve emits
        # (quant/ganq.t_step_affine); serve-side certification
        # (ops/qlinear.certify_uniform) recodes it LOSSLESSLY onto the
        # packed-W4 uniform kernels. The sym variant pins the intercept so
        # the recode is zero-free and rides the sym-only megastep kernels —
        # this is the GANQ-LUT bench artifact.
        k1, k2, k3 = jax.random.split(key, 3)
        b = jax.random.uniform(k1, (out_f, 1), jnp.float32, 0.001, 0.004)
        if kind == "lut_affine_sym":
            lut = (b * (jnp.arange(16, dtype=jnp.float32) - 8.0)
                   ).astype(jnp.bfloat16)
        else:
            a = jax.random.uniform(k3, (out_f, 1), jnp.float32,
                                   -0.002, 0.002)
            grid = jnp.arange(16, dtype=jnp.float32) - 7.5
            lut = (a + b * grid).astype(jnp.bfloat16)
        idx = jax.random.randint(k2, (out_f, in_f), 0, 16, jnp.int32)
        return {"lut": lut, "idx_packed": pack_int_rows(idx, 4)}
    if kind == "w8":
        k1, k2 = jax.random.split(key)
        w8 = jax.random.randint(k1, (out_f, in_f), -127, 128,
                                jnp.int32).astype(jnp.int8)
        scale = jax.random.uniform(k2, (out_f, 1), jnp.float32, 1e-4, 4e-4)
        return {"w8": w8, "scale": scale}
    if kind == "uniform":
        k1, k2 = jax.random.split(key)
        gs = 128 if in_f % 128 == 0 else in_f
        ng = in_f // gs
        qidx = jax.random.randint(k1, (out_f, in_f), 0, 2 ** bits, jnp.int32)
        # scale capped so the dequantized weight RANGE (scale * 2^(b-1))
        # never exceeds the bits=4 range — activation magnitudes (and the
        # test tolerances calibrated at bits=4) stay comparable at bits=8
        scales = jax.random.uniform(k2, (out_f, ng), jnp.float32,
                                    0.001, 0.004) * min(1.0, 16.0 / (1 << bits))
        # sym (zero point 2^(bits-1)), sequential groups: both structural
        # (omitted)
        return {"qweight": pack_int_rows(qidx, bits), "scales": scales}
    raise ValueError(kind)


def _linear_from_arrays(arrays, kind: str, in_f: int,
                        bits: int = 4) -> qlinear.QLinear:
    bits = {"dense": 16, "w8": 8}.get(kind, bits)
    if kind in ("lut_affine", "lut_affine_sym"):
        kind = "lut"            # same artifact kind, affine codebook
    return qlinear.QLinear(kind, dict(arrays), bits=bits, in_features=in_f)


def _rand_linear(key, out_f: int, in_f: int, kind: str, dtype=jnp.bfloat16,
                 bits: int = 4):
    if kind == "dense":
        w = jax.random.normal(key, (out_f, in_f), dtype) * 0.02
        return qlinear.dense_linear(w)
    if kind == "lut":
        k1, k2 = jax.random.split(key)
        lut = jnp.sort(jax.random.normal(k1, (out_f, 16), jnp.float32) * 0.02, axis=1)
        idx = jax.random.randint(k2, (out_f, in_f), 0, 16, jnp.int32)
        return qlinear.lut_linear(lut, idx, 4)
    if kind in ("lut_affine", "lut_affine_sym"):
        k1, k2, k3 = jax.random.split(key, 3)
        b = jax.random.uniform(k1, (out_f, 1), jnp.float32, 0.001, 0.004)
        if kind == "lut_affine_sym":
            lut = b * (jnp.arange(16, dtype=jnp.float32) - 8.0)
        else:
            a = jax.random.uniform(k3, (out_f, 1), jnp.float32,
                                   -0.002, 0.002)
            lut = a + b * (jnp.arange(16, dtype=jnp.float32) - 7.5)
        idx = jax.random.randint(k2, (out_f, in_f), 0, 16, jnp.int32)
        return qlinear.lut_linear(lut, idx, 4)
    if kind == "w8":
        k1, k2 = jax.random.split(key)
        w8 = jax.random.randint(k1, (out_f, in_f), -127, 128, jnp.int32).astype(jnp.int8)
        scale = jax.random.uniform(k2, (out_f, 1), jnp.float32, 1e-4, 4e-4)
        return qlinear.QLinear("w8", {"w8": w8, "scale": scale}, bits=8,
                               in_features=in_f)
    if kind == "uniform":
        k1, k2 = jax.random.split(key)
        gs = 128 if in_f % 128 == 0 else in_f
        ng = in_f // gs
        qidx = jax.random.randint(k1, (out_f, in_f), 0, 2 ** bits, jnp.int32)
        scales = jax.random.uniform(k2, (out_f, ng), jnp.float32,
                                    0.001, 0.004) * min(1.0, 16.0 / (1 << bits))
        zeros = jnp.full((out_f, ng), float(2 ** (bits - 1)), jnp.float32)
        g_idx = (jnp.arange(in_f) // gs).astype(jnp.int32)
        return qlinear.uniform_linear(qidx, scales, zeros, g_idx, bits)
    raise ValueError(kind)


def make_model(cfg: ModelConfig, kind: str = "lut", seed: int = 0,
               dtype=jnp.bfloat16, bits: int = 4) -> Dict[str, Any]:
    """Random params pytree with every layer linear in format ``kind``."""
    _rl = functools.partial(_rand_linear, bits=bits)
    key = jax.random.PRNGKey(seed)
    ks = iter(jax.random.split(key, 16 + cfg.num_hidden_layers * 8))
    h, q, kv, it = (cfg.hidden_size, cfg.q_dim, cfg.kv_dim, cfg.intermediate_size)
    params: Dict[str, Any] = {
        "embed_tokens": {"weight": jax.random.normal(next(ks), (cfg.vocab_size, h), dtype) * 0.02},
        "final_norm": {"weight": jnp.ones((h,), dtype)},
        "layers": [],
    }
    for _ in range(cfg.num_hidden_layers):
        lp = {
            "input_norm": {"weight": jnp.ones((h,), dtype)},
            "post_norm": {"weight": jnp.ones((h,), dtype)},
            "attn": {
                "q": _rl(next(ks), q, h, kind, dtype),
                "k": _rl(next(ks), kv, h, kind, dtype),
                "v": _rl(next(ks), kv, h, kind, dtype),
                "o": _rl(next(ks), h, q, kind, dtype),
            },
            "mlp": {
                "gate": _rl(next(ks), it, h, kind, dtype),
                "up": _rl(next(ks), it, h, kind, dtype),
                "down": _rl(next(ks), h, it, kind, dtype),
            },
        }
        params["layers"].append(lp)
    return params


def make_stacked_model(cfg: ModelConfig, kind: str = "lut", seed: int = 0,
                       dtype=jnp.bfloat16,
                       lm_head_kind: str | None = None,
                       bits: int = 4) -> Dict[str, Any]:
    """Build the fused+stacked serving pytree directly (qkv and gateup fused,
    leading layer axis on every leaf) — no transient per-layer copies, so
    multi-GB models fit while being constructed on-chip."""
    key = jax.random.PRNGKey(seed)
    ks = iter(jax.random.split(key, 8 + cfg.num_hidden_layers * 4))
    h, q, kv, it = (cfg.hidden_size, cfg.q_dim, cfg.kv_dim, cfg.intermediate_size)
    L = cfg.num_hidden_layers

    def stacked_linear(keys, out_f, in_f):
        arrays = [_rand_arrays(k, out_f, in_f, kind, dtype, bits)
                  for k in keys]
        stacked_arrays = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *arrays)
        return _linear_from_arrays(stacked_arrays, kind, in_f, bits)

    layer_keys = jax.random.split(next(ks), L * 4).reshape(L, 4, 2)
    attn = {
        "qkv": stacked_linear(layer_keys[:, 0], q + 2 * kv, h),
        "o": stacked_linear(layer_keys[:, 1], h, q),
    }
    if getattr(attn["o"], "kind", None) == "w8":
        # transposed o weight for the attention-half megakernel
        attn["o_t_w8"] = jnp.transpose(attn["o"]["w8"], (0, 2, 1))
        attn["o_t_scale"] = jnp.transpose(attn["o"]["scale"], (0, 2, 1))
    stacked = {
        "input_norm": {"weight": jnp.ones((L, h), dtype)},
        "post_norm": {"weight": jnp.ones((L, h), dtype)},
        "attn": attn,
        "mlp": {
            "gateup": stacked_linear(layer_keys[:, 2], 2 * it, h),
            "down": stacked_linear(layer_keys[:, 3], h, it),
        },
    }
    out = {
        "embed_tokens": {"weight": jax.random.normal(next(ks), (cfg.vocab_size, h), dtype) * 0.02},
        "final_norm": {"weight": jnp.ones((h,), dtype)},
        "layers_stacked": stacked,
        "num_layers": L,
    }
    if lm_head_kind is not None:
        # quantized lm_head (the reference's 8-bit lm_head rule,
        # module_looper.py:146): halves/quarters the decode unembed read,
        # which is the largest per-step cost outside the layer stack
        arrays = _rand_arrays(next(ks), cfg.vocab_size, h, lm_head_kind,
                              dtype)
        out["lm_head"] = _linear_from_arrays(arrays, lm_head_kind, h)
    return out


__all__ = ["llama_config", "make_model", "make_stacked_model"]


def hymba_config(hidden: int = 256, inter: int = 512, layers: int = 3,
                 heads: int = 4, kv_heads: int = 2, vocab: int = 512,
                 ssm_state: int = 8, ssm_conv: int = 4, dt_rank: int = 16,
                 meta_tokens: int = 4,
                 kv_reuse_map=None, max_pos: int = 512) -> ModelConfig:
    """Hymba-style hybrid-head config (reference
    models/definitions/hymba.py): attention∥SSM layers with fused in_proj,
    meta tokens, optional cross-layer KV reuse. d_inner == q_dim (the two
    branch outputs average)."""
    return ModelConfig(
        model_type="hymba", vocab_size=vocab, hidden_size=hidden,
        intermediate_size=inter, num_hidden_layers=layers,
        num_attention_heads=heads, num_key_value_heads=kv_heads,
        head_dim=hidden // heads, max_position_embeddings=max_pos,
        norm="rmsnorm", act="silu", gated_mlp=True, pos="rope",
        tie_word_embeddings=True, ssm_hybrid=True,
        ssm_inner=hidden, ssm_state=ssm_state, ssm_conv=ssm_conv,
        ssm_dt_rank=dt_rank, num_meta_tokens=meta_tokens,
        kv_reuse_map=kv_reuse_map)


def make_hymba_model(cfg: ModelConfig, kind: str = "dense", seed: int = 0,
                     dtype=jnp.bfloat16, bits: int = 4) -> Dict[str, Any]:
    """Random hymba params: per layer one fused mamba.in_proj
    [2*Di + q_dim + 2*kv_dim, H] and mamba.out_proj [H, Di] (the
    quantization targets, reference hymba.py layer_modules) plus the SSM
    internals (x_proj/dt_proj/conv/A_log/D, kept dense like the reference,
    which skips them) and the single-expert gated MLP."""
    _rl = functools.partial(_rand_linear, bits=bits)
    key = jax.random.PRNGKey(seed)
    ks = iter(jax.random.split(key, 16 + cfg.num_hidden_layers * 10))
    h, q, kv, it = (cfg.hidden_size, cfg.q_dim, cfg.kv_dim,
                    cfg.intermediate_size)
    Di = cfg.ssm_inner or q
    N, K = cfg.ssm_state, cfg.ssm_conv
    dtr = cfg.ssm_dt_rank or max(1, h // 16)
    params: Dict[str, Any] = {
        "embed_tokens": {"weight": jax.random.normal(
            next(ks), (cfg.vocab_size, h), dtype) * 0.02},
        "final_norm": {"weight": jnp.ones((h,), dtype)},
        "layers": [],
    }
    if cfg.num_meta_tokens:
        params["meta_tokens"] = jax.random.normal(
            next(ks), (cfg.num_meta_tokens, h), jnp.float32) * 0.02
    for _ in range(cfg.num_hidden_layers):
        # dt_proj bias initialized so softplus(dt) starts near 0.1-1.0
        # (mamba's inverse-softplus init keeps the scan stable)
        dt_b = jnp.log(jnp.expm1(jnp.asarray(
            np.random.default_rng(3).uniform(0.1, 1.0, size=(Di,))
            .astype(np.float32))))
        lp = {
            "input_norm": {"weight": jnp.ones((h,), dtype)},
            "post_norm": {"weight": jnp.ones((h,), dtype)},
            "mamba": {
                "in_proj": _rl(next(ks), 2 * Di + q + 2 * kv, h, kind,
                               dtype),
                "out_proj": _rl(next(ks), h, Di, kind, dtype),
                "conv_w": jax.random.normal(next(ks), (K, Di),
                                            jnp.float32) * 0.2,
                "conv_b": jnp.zeros((Di,), jnp.float32),
                "x_proj": {"weight": jax.random.normal(
                    next(ks), (dtr + 2 * N, Di), jnp.float32) * 0.05},
                "dt_proj": {"weight": jax.random.normal(
                    next(ks), (Di, dtr), jnp.float32) * 0.05,
                    "bias": dt_b},
                "A_log": jnp.log(jnp.broadcast_to(
                    jnp.arange(1, N + 1, dtype=jnp.float32)[None, :],
                    (Di, N))),
                "D": jnp.ones((Di,), jnp.float32),
                "attn_norm": {"weight": jnp.ones((Di,), jnp.float32)},
                "ssm_norm": {"weight": jnp.ones((Di,), jnp.float32)},
            },
            "mlp": {
                "gate": _rl(next(ks), it, h, kind, dtype),
                "up": _rl(next(ks), it, h, kind, dtype),
                "down": _rl(next(ks), h, it, kind, dtype),
            },
        }
        params["layers"].append(lp)
    return params
