"""W4A8 pair-nibble megakernel (ops/megastep4.py) vs its pure-jnp oracle:
the pair algebra must be EXACT on the integer side, so kernel-vs-oracle
differences are bf16/f32 rounding only."""

import os

import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import jax.numpy as jnp

from ganq_tpu.models import synthetic
from ganq_tpu.ops.megastep4 import (megapack4, megastep4_decode,
                                    megastep4_fusable, megastep4_reference)
from ganq_tpu.ops.qlinear import QLinear, dequantize_weight


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _ctx():
    return (pltpu.force_tpu_interpret_mode()
            if not os.environ.get("GANQ_TPU_TEST_TPU") else _null())


def _cfg(layers=2, heads=2, kv_heads=1, inter=512):
    return synthetic.llama_config(hidden=128 * heads, inter=inter,
                                  layers=layers, heads=heads,
                                  kv_heads=kv_heads, vocab=512, max_pos=128)


def _sub(m, i):
    return QLinear(m.kind, {k: v[i] for k, v in m.arrays.items()},
                   m.bits, m.in_features)


def _lw_list(cfg, sp):
    ls = sp["layers_stacked"]
    L = cfg.num_hidden_layers
    out = []
    for i in range(L):
        qkv = _sub(ls["attn"]["qkv"], i)
        o = _sub(ls["attn"]["o"], i)
        gu = _sub(ls["mlp"]["gateup"], i)
        dn = _sub(ls["mlp"]["down"], i)
        I = gu["qweight"].shape[0] // 2
        guw = dequantize_weight(gu)
        bias = qkv.arrays.get("bias")
        out.append({
            "attn_norm": ls["input_norm"]["weight"][i].astype(jnp.float32),
            "mlp_norm": ls["post_norm"]["weight"][i].astype(jnp.float32),
            "qkv_w": dequantize_weight(qkv).astype(jnp.float32),
            "qkv_bias": (bias.astype(jnp.float32) if bias is not None
                         else jnp.zeros((qkv["qweight"].shape[0],),
                                        jnp.float32)),
            "o_w": dequantize_weight(o).astype(jnp.float32),
            "gate_w": guw[:I].astype(jnp.float32),
            "up_w": guw[I:].astype(jnp.float32),
            "down_w": dequantize_weight(dn).astype(jnp.float32),
        })
    return out


def _setup(rng, cfg, B, T, pos):
    sp = synthetic.make_stacked_model(cfg, kind="uniform", seed=3)
    L, H = cfg.num_hidden_layers, cfg.hidden_size
    sp["layers_stacked"]["input_norm"]["weight"] = jnp.asarray(
        rng.uniform(0.5, 1.5, size=(L, H)).astype(np.float32))
    sp["layers_stacked"]["post_norm"]["weight"] = jnp.asarray(
        rng.uniform(0.5, 1.5, size=(L, H)).astype(np.float32))
    assert megastep4_fusable(cfg, sp)
    mp = megapack4(cfg, sp)
    Hkv = cfg.num_key_value_heads
    d = cfg.head_dim
    kc = jnp.zeros((L, B * Hkv, T, d), jnp.bfloat16)
    vc = jnp.zeros((L, B * Hkv, T, d), jnp.bfloat16)
    kc = kc.at[:, :, :pos].set(jnp.asarray(
        rng.normal(size=(L, B * Hkv, pos, d)).astype(np.float32) * 0.3,
        jnp.bfloat16))
    vc = vc.at[:, :, :pos].set(jnp.asarray(
        rng.normal(size=(L, B * Hkv, pos, d)).astype(np.float32) * 0.3,
        jnp.bfloat16))
    kc = kc.at[:, :, pos:].set(23.0)
    vc = vc.at[:, :, pos:].set(-7.0)
    x = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32) * 0.4,
                    jnp.bfloat16)
    half = d // 2
    ang = rng.uniform(0, 2 * np.pi, size=(half,)).astype(np.float32)
    return (sp, mp, kc, vc, x,
            jnp.asarray(np.cos(ang)), jnp.asarray(np.sin(ang)))


@pytest.mark.parametrize("B,pos,T,inter", [
    (8, 50, 64, 512),
    (4, 3, 128, 512),
    # inter=768 -> ti=256, gti=2: exercises the padded tile-major down
    # scales (sublane rule) and a 3-tile MLP walk
    (8, 20, 64, 768),
])
def test_megastep4_matches_reference(rng, B, pos, T, inter):
    cfg = _cfg(inter=inter)
    sp, mp, kc, vc, x, cos, sin = _setup(rng, cfg, B, T, pos)
    kv_dim = cfg.num_key_value_heads * cfg.head_dim
    kw = dict(q_dim=cfg.q_dim, kv_dim=kv_dim, head_dim=cfg.head_dim,
              rotary_dim=cfg.head_dim, eps=1e-5,
              scale=float(1.0 / np.sqrt(cfg.head_dim)))
    lw = _lw_list(cfg, sp)
    ref_y, ref_k, ref_v = megastep4_reference(x, lw, kc, vc, pos, cos, sin,
                                              **kw)
    with _ctx():
        y, kn, vn = megastep4_decode(x, mp, kc, vc, jnp.int32(pos),
                                     cos, sin, block_t=64, **kw)
    np.testing.assert_allclose(np.asarray(kn, np.float32),
                               np.asarray(ref_k, np.float32),
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(vn, np.float32),
                               np.asarray(ref_v, np.float32),
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(ref_y, np.float32),
                               atol=5e-2, rtol=5e-2)


def test_pair_pack_roundtrip(rng):
    """The pair-nibble byte algebra: signed byte == 16*(q_hi-8) + q_lo."""
    from ganq_tpu.ops.megastep4 import _pair_rows

    codes = rng.integers(0, 16, size=(8, 16)).astype(np.int64)
    b = _pair_rows(codes, 8).astype(np.int64)    # pairs rows (r, r+4)
    for t in range(2):
        lo = codes[t * 8:t * 8 + 4]
        hi = codes[t * 8 + 4:(t + 1) * 8]
        np.testing.assert_array_equal(b[t * 4:(t + 1) * 4],
                                      16 * (hi - 8) + lo)
        np.testing.assert_array_equal(b[t * 4:(t + 1) * 4] & 15, lo)


def test_megastep4_greedy_decode_path(rng, monkeypatch):
    """greedy_decode routed through the W4 megastep scan (GANQ_MEGASTEP=1
    on CPU -> interpret mode) agrees with the reference-backend decode."""
    import jax

    from ganq_tpu.serve import stacked

    monkeypatch.setenv("GANQ_MEGASTEP", "1")
    monkeypatch.setenv("GANQ_W4_PLANE", "0")   # pin the pair kernel route
    cfg = _cfg(layers=2)
    B, prompt, steps, T = 4, 8, 4, 64
    sp, mp, _, _, _, _, _ = _setup(rng, cfg, B, T, 1)
    assert stacked.mega_enabled(cfg, sp, "reference", B) == "w4"
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(B, prompt)),
                      jnp.int32)
    ck, cv = stacked.init_cache(cfg, cfg.num_hidden_layers, B, T)
    toks = np.asarray(stacked.greedy_decode(cfg, sp, ck, cv, ids, steps,
                                            "reference"))
    monkeypatch.setenv("GANQ_MEGASTEP", "0")
    ck, cv = stacked.init_cache(cfg, cfg.num_hidden_layers, B, T)
    ref = np.asarray(stacked.greedy_decode(cfg, sp, ck, cv, ids, steps,
                                           "reference"))
    # near-ties can flip argmax between kernel and reference numerics
    agree = (toks == ref).mean()
    assert agree >= 0.9, f"token agreement {agree:.2f}\n{toks}\n{ref}"
