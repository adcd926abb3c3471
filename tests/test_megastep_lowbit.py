"""W3A8/W2A8 plane-packed megakernel (ops/megastep_lowbit.py) vs the
megastep4 oracle: the masked-dot field algebra must be EXACT on the integer
side, so kernel-vs-oracle differences are bf16/f32 rounding only.

Shapes here satisfy the real-hardware lane-alignment gate (H % g_r*128):
the same layouts the kernel runs on chip, exercised in interpret mode."""

import os

import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import jax.numpy as jnp

from ganq_tpu.models import synthetic
from ganq_tpu.ops.megastep_lowbit import (megapack_lowbit,
                                          megastep_lowbit_decode,
                                          megastep_lowbit_fusable,
                                          megastep_lowbit_reference,
                                          _derive, _plan_meta, _plane_pack,
                                          _recover)
from ganq_tpu.ops.qlinear import QLinear, dequantize_weight


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _ctx():
    return (pltpu.force_tpu_interpret_mode()
            if not os.environ.get("GANQ_TPU_TEST_TPU") else _null())


def _cfg(layers=2, heads=16, kv_heads=4, inter=1024):
    return synthetic.llama_config(hidden=128 * heads, inter=inter,
                                  layers=layers, heads=heads,
                                  kv_heads=kv_heads, vocab=512, max_pos=128)


def _sub(m, i):
    return QLinear(m.kind, {k: v[i] for k, v in m.arrays.items()},
                   m.bits, m.in_features)


def _lw_list(cfg, sp):
    ls = sp["layers_stacked"]
    out = []
    for i in range(cfg.num_hidden_layers):
        qkv = _sub(ls["attn"]["qkv"], i)
        o = _sub(ls["attn"]["o"], i)
        gu = _sub(ls["mlp"]["gateup"], i)
        dn = _sub(ls["mlp"]["down"], i)

        def _rows(m):       # per-layer out features for any artifact kind
            return (m["scales"] if "scales" in m.arrays
                    else m["lut"]).shape[0]

        I = _rows(gu) // 2
        guw = dequantize_weight(gu)
        gub = gu.arrays.get("bias")
        lw = {
            "attn_norm": ls["input_norm"]["weight"][i].astype(jnp.float32),
            "mlp_norm": ls["post_norm"]["weight"][i].astype(jnp.float32),
            "qkv_w": dequantize_weight(qkv).astype(jnp.float32),
            "qkv_bias": (qkv.arrays["bias"].astype(jnp.float32)
                         if "bias" in qkv.arrays else
                         jnp.zeros((_rows(qkv),), jnp.float32)),
            "o_w": dequantize_weight(o).astype(jnp.float32),
            "gate_w": guw[:I].astype(jnp.float32),
            "up_w": guw[I:].astype(jnp.float32),
            "down_w": dequantize_weight(dn).astype(jnp.float32),
        }
        if "q_norm" in ls["attn"]:
            lw["q_norm"] = ls["attn"]["q_norm"]["weight"][i].astype(
                jnp.float32)
            lw["k_norm"] = ls["attn"]["k_norm"]["weight"][i].astype(
                jnp.float32)
        if "post_attn_norm" in ls:
            lw["post_attn_norm"] = ls["post_attn_norm"]["weight"][i].astype(
                jnp.float32)
            lw["post_mlp_norm"] = ls["post_mlp_norm"]["weight"][i].astype(
                jnp.float32)
        if "bias" in o.arrays:
            lw["o_bias"] = o.arrays["bias"].astype(jnp.float32)
        if gub is not None:
            lw["gate_bias"] = gub[:I].astype(jnp.float32)
            lw["up_bias"] = gub[I:].astype(jnp.float32)
        if "bias" in dn.arrays:
            lw["down_bias"] = dn.arrays["bias"].astype(jnp.float32)
        out.append(lw)
    return out


def _setup(rng, cfg, B, T, pos, bits, bias=False, asym=False,
           kind="uniform"):
    sp = synthetic.make_stacked_model(cfg, kind=kind, seed=3, bits=bits)
    L, H = cfg.num_hidden_layers, cfg.hidden_size
    if cfg.qk_norm:
        d = cfg.head_dim
        lo, hi = (-0.3, 0.3) if cfg.rms_offset else (0.5, 1.5)
        sp["layers_stacked"]["attn"]["q_norm"] = {"weight": jnp.asarray(
            rng.uniform(lo, hi, size=(L, d)).astype(np.float32))}
        sp["layers_stacked"]["attn"]["k_norm"] = {"weight": jnp.asarray(
            rng.uniform(lo, hi, size=(L, d)).astype(np.float32))}
    if cfg.sandwich_norm:
        sp["layers_stacked"]["post_attn_norm"] = {"weight": jnp.asarray(
            rng.uniform(-0.3, 0.3, size=(L, H)).astype(np.float32))}
        sp["layers_stacked"]["post_mlp_norm"] = {"weight": jnp.asarray(
            rng.uniform(-0.3, 0.3, size=(L, H)).astype(np.float32))}
    if asym:
        # random per-group zero points (fractional: the general case —
        # certify_uniform emits fractional zeros; gptq-v1 ships integers)
        ls = sp["layers_stacked"]
        for mod in (ls["attn"]["qkv"], ls["attn"]["o"],
                    ls["mlp"]["gateup"], ls["mlp"]["down"]):
            mod["zeros"] = jnp.asarray(rng.uniform(
                0.25 * 2 ** bits, 0.75 * 2 ** bits,
                size=mod["scales"].shape).astype(np.float32))
    sp["layers_stacked"]["input_norm"]["weight"] = jnp.asarray(
        rng.uniform(0.5, 1.5, size=(L, H)).astype(np.float32))
    sp["layers_stacked"]["post_norm"]["weight"] = jnp.asarray(
        rng.uniform(0.5, 1.5, size=(L, H)).astype(np.float32))
    if bias:
        ls = sp["layers_stacked"]

        def _w(m):          # stacked out-features for any artifact kind
            return (m["scales"].shape[1] if "scales" in m.arrays
                    else m["lut"].shape[1])

        for mod, width in ((ls["attn"]["qkv"], _w(ls["attn"]["qkv"])),
                           (ls["attn"]["o"], H),
                           (ls["mlp"]["gateup"], _w(ls["mlp"]["gateup"])),
                           (ls["mlp"]["down"], H)):
            mod["bias"] = jnp.asarray(
                rng.normal(size=(L, width)).astype(np.float32) * 0.05)
    if kind == "lut":
        from ganq_tpu.ops.megastep_lowbit import (megapack_walsh,
                                                  megastep_walsh_fusable)
        assert megastep_walsh_fusable(cfg, sp)
        mp = megapack_walsh(cfg, sp)
    else:
        assert megastep_lowbit_fusable(cfg, sp, bits)
        mp = megapack_lowbit(cfg, sp, bits)
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


@pytest.mark.parametrize("bits,B,pos,T,inter", [
    (4, 8, 50, 64, False),
    (3, 8, 50, 64, False),
    (3, 4, 3, 64, False),
    (2, 8, 20, 64, False),
    (4, 16, 50, 64, False),  # batch > 8: octet-tiled row stride (Bp = 16)
    (3, 12, 20, 64, False),  # batch > 8, not an octet multiple (Bp = 16)
    (8, 8, 50, 64, False),   # w8p: int8 plane (free-codebook GANQ recodes)
    (8, 24, 20, 64, False),  # w8p at serving batch
    (4, 1, 10, 64, False),   # B*Hkv=4: BGp sublane pad (r3 advisor ask)
    (4, 8, 30, 64, True),    # interleaved rope (_rope_rot parity branch,
    (3, 8, 30, 64, True),    #  r4 advisor ask: the branch shipped untested)
    (3, 48, 20, 64, False),  # batch > 32 (r5: plane-kernel cap now 64)
    (4, 64, 10, 64, False),  # the cap (MXU-pad-reclaim regime)
])
def test_megastep_lowbit_matches_reference(rng, bits, B, pos, T, inter):
    cfg = _cfg()
    sp, mp, kc, vc, x, cos, sin = _setup(rng, cfg, B, T, pos, bits)
    kv_dim = cfg.num_key_value_heads * cfg.head_dim
    kw = dict(q_dim=cfg.q_dim, kv_dim=kv_dim, head_dim=cfg.head_dim,
              rotary_dim=cfg.head_dim, eps=1e-5, interleaved=inter,
              scale=float(1.0 / np.sqrt(cfg.head_dim)))
    lw = _lw_list(cfg, sp)
    ref_y, ref_k, ref_v = megastep_lowbit_reference(x, lw, kc, vc, pos,
                                                    cos, sin, **kw)
    with _ctx():
        y, kn, vn = megastep_lowbit_decode(x, mp, kc, vc, jnp.int32(pos),
                                           cos, sin, block_t=64, bits=bits,
                                           **kw)
    # 3e-2: kernel group-sequential f32 sums vs the oracle's single dot can
    # flip an int8 activation code at the round-to-nearest boundary (one
    # quant step ~2.5e-2 at these magnitudes); more batch rows, more
    # flips — and the MAX over ~200k samples grows, hence the deep-batch
    # widening (b96: 7/196608 elements at <=0.086, pure flip noise)
    y_atol = 1e-1 if B >= 64 else 5e-2
    kv_atol = 5e-2 if B >= 48 else 3e-2
    np.testing.assert_allclose(np.asarray(kn, np.float32),
                               np.asarray(ref_k, np.float32),
                               atol=kv_atol, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(vn, np.float32),
                               np.asarray(ref_v, np.float32),
                               atol=kv_atol, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(ref_y, np.float32),
                               atol=y_atol, rtol=5e-2)


@pytest.mark.parametrize("B,pos,bias", [
    (8, 50, False),
    (4, 3, False),
    (16, 20, False),      # batch > 8 through the walsh walks
    (40, 20, False),      # batch > 32 (r5: the MXU-pad-reclaim regime)
    (8, 30, True),        # biased projections compose with walsh
])
def test_megastep_walsh_lut8(rng, B, pos, bias):
    """TRUE per-row 8-entry LUT artifacts (GANQ bits=3 — unconstrained
    codebooks) decode EXACTLY in the plane megastep via the Walsh
    expansion at 3 bits/weight streamed (VERDICT r4 #1, the paper's
    LUT-mpGEMM thesis): kernel vs the dequantized-codebook oracle."""
    cfg = _cfg()
    T = 64
    sp, mp, kc, vc, x, cos, sin = _setup(rng, cfg, B, T, pos, 3,
                                         bias=bias, kind="lut")
    kv_dim = cfg.num_key_value_heads * cfg.head_dim
    kw = dict(q_dim=cfg.q_dim, kv_dim=kv_dim, head_dim=cfg.head_dim,
              rotary_dim=cfg.head_dim, eps=1e-5,
              scale=float(1.0 / np.sqrt(cfg.head_dim)))
    lw = _lw_list(cfg, sp)
    ref_y, ref_k, ref_v = megastep_lowbit_reference(x, lw, kc, vc, pos,
                                                    cos, sin, **kw)
    with _ctx():
        y, kn, vn = megastep_lowbit_decode(x, mp, kc, vc, jnp.int32(pos),
                                           cos, sin, block_t=64, bits=3,
                                           walsh=7, **kw)
    np.testing.assert_allclose(np.asarray(kn, np.float32),
                               np.asarray(ref_k, np.float32),
                               atol=3e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(vn, np.float32),
                               np.asarray(ref_v, np.float32),
                               atol=3e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(ref_y, np.float32),
                               atol=5e-2, rtol=5e-2)


def test_walsh_coef_exact(rng):
    """The Walsh transform reproduces ANY 8-entry codebook exactly:
    T[r, c] == c0[r] + sum_S c_S[r] * m_S(c) for all 8 codes."""
    from ganq_tpu.ops.megastep_lowbit import _MONO, walsh_coef
    lut = rng.normal(size=(64, 8)).astype(np.float32)
    cf = np.asarray(walsh_coef(lut))              # [8, 64]
    rec = np.zeros_like(lut)
    for c in range(8):
        v = cf[0]
        for j, S in enumerate(_MONO):
            bit = 0
            for b in S:
                bit ^= (c >> b) & 1
            v = v + cf[1 + j] * bit
        rec[:, c] = v
    np.testing.assert_allclose(rec, lut, atol=1e-5)


def test_megastep_walsh_greedy_serving(rng, monkeypatch):
    """8-entry LUT artifacts through the FULL serving wiring: prepack
    routes them to the walsh megastep ("wl8") and greedy_decode matches
    the per-layer exact-LUT reference path."""
    from ganq_tpu.serve import stacked

    monkeypatch.setenv("GANQ_MEGASTEP", "1")
    cfg = _cfg(layers=2)
    B, prompt, steps, T = 4, 8, 4, 64
    sp, _, _, _, _, _, _ = _setup(rng, cfg, B, T, 1, 3, kind="lut")
    assert stacked.mega_enabled(cfg, sp, "reference", B) == "wl8"
    psp = stacked.prepack(cfg, sp, "reference", B)
    assert "megapack_wl" in psp
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(B, prompt)),
                      jnp.int32)
    ck, cv = stacked.init_cache(cfg, cfg.num_hidden_layers, B, T)
    toks = np.asarray(stacked.greedy_decode(cfg, psp, ck, cv, ids, steps,
                                            "reference"))
    monkeypatch.setenv("GANQ_MEGASTEP", "0")
    ck, cv = stacked.init_cache(cfg, cfg.num_hidden_layers, B, T)
    ref = np.asarray(stacked.greedy_decode(cfg, sp, ck, cv, ids, steps,
                                           "reference"))
    agree = (toks == ref).mean()
    assert agree >= 0.9, f"token agreement {agree:.2f}\n{toks}\n{ref}"


@pytest.mark.parametrize("bits", [4, 8])
def test_megastep_lowbit_qk_norm(rng, bits):
    """Per-head qk-norm (qwen3) rides the plane megastep via the in-kernel
    butterfly block-RMS (VERDICT r3 #6): parity vs the oracle, which
    applies transformer._rms_vec semantics per head pre-rope."""
    import dataclasses
    cfg = dataclasses.replace(_cfg(), qk_norm=True)
    B, T, pos = 8, 64, 30
    sp, mp, kc, vc, x, cos, sin = _setup(rng, cfg, B, T, pos, bits)
    assert "qk_nm" in mp
    kv_dim = cfg.num_key_value_heads * cfg.head_dim
    kw = dict(q_dim=cfg.q_dim, kv_dim=kv_dim, head_dim=cfg.head_dim,
              rotary_dim=cfg.head_dim, eps=1e-5,
              scale=float(1.0 / np.sqrt(cfg.head_dim)))
    lw = _lw_list(cfg, sp)
    assert "q_norm" in lw[0]
    ref_y, ref_k, ref_v = megastep_lowbit_reference(x, lw, kc, vc, pos,
                                                    cos, sin, **kw)
    with _ctx():
        y, kn, vn = megastep_lowbit_decode(x, mp, kc, vc, jnp.int32(pos),
                                           cos, sin, block_t=64, bits=bits,
                                           **kw)
    # 8e-2: the head RMS normalizes lanes to ~unit scale, so a single int8
    # activation-code flip (the known boundary effect, see
    # test_megastep_lowbit_matches_reference) lands at ~1/127 of O(1)
    # values on a handful of lanes
    np.testing.assert_allclose(np.asarray(kn, np.float32),
                               np.asarray(ref_k, np.float32),
                               atol=8e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(vn, np.float32),
                               np.asarray(ref_v, np.float32),
                               atol=8e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(ref_y, np.float32),
                               atol=8e-2, rtol=5e-2)


def test_megastep_lowbit_gemma2_shape(rng):
    """Gemma-2-shape decode rides the plane megastep (VERDICT r3 #6):
    sandwich norms (post-attn/post-ffw RMS on the sublayer output,
    rms_offset=1), attention softcap (tanh insert in the flash phase), and
    alternating sliding/full layers (per-layer window operands). Parity vs
    the extended oracle."""
    import dataclasses
    cfg = dataclasses.replace(
        _cfg(), sandwich_norm=True, attn_softcap=30.0, sliding_window=24,
        layer_types=("sliding_attention", "full_attention"),
        act="gelu_tanh", rms_offset=1.0)
    bits, B, T, pos = 4, 8, 64, 40
    sp, mp, kc, vc, x, cos, sin = _setup(rng, cfg, B, T, pos, bits)
    assert "pa_norm" in mp
    kv_dim = cfg.num_key_value_heads * cfg.head_dim
    kw = dict(q_dim=cfg.q_dim, kv_dim=kv_dim, head_dim=cfg.head_dim,
              rotary_dim=cfg.head_dim, eps=1e-5, rms_offset=1.0,
              act="gelu_tanh", softcap=30.0,
              scale=float(1.0 / np.sqrt(cfg.head_dim)))
    lw = _lw_list(cfg, sp)
    for i, l in enumerate(lw):
        l["window"] = cfg.layer_window(i)
    ref_y, ref_k, ref_v = megastep_lowbit_reference(x, lw, kc, vc, pos,
                                                    cos, sin, **kw)
    windows = jnp.asarray([cfg.layer_window(i) or T
                           for i in range(cfg.num_hidden_layers)], jnp.int32)
    with _ctx():
        y, kn, vn = megastep_lowbit_decode(x, mp, kc, vc, jnp.int32(pos),
                                           cos, sin, block_t=64, bits=bits,
                                           windows=windows, **kw)
    _assert_close_rel(kn, ref_k)
    _assert_close_rel(y, ref_y)


def _assert_close_rel(got, want, frac=0.035, mean_frac=7e-3):
    """Range-relative closeness for the gemma-shape tests: rms_offset=1
    norms + gelu_tanh amplify the known single-int8-code-flip noise (the
    all-features-OFF baseline at this config already shows the same error
    scale), so absolute atols calibrated on the llama-shape tests do not
    transfer. Max error <= frac of the reference range AND mean error
    <= mean_frac of it — structural errors blow both."""
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    scale = np.abs(want).max() + 1e-9
    err = np.abs(got - want)
    assert err.max() <= frac * scale, (err.max(), scale)
    assert err.mean() <= mean_frac * scale, (err.mean(), scale)


def test_megastep_lowbit_gemma3_shape(rng):
    """Gemma-3-shape: dual local/global rope (stacked cos/sin tables + the
    per-layer selector riding the scalar prefetch), per-head qk-norm with
    the (1+w) offset, sandwich norms, sliding layers — all in ONE kernel."""
    import dataclasses
    cfg = dataclasses.replace(
        _cfg(), sandwich_norm=True, sliding_window=24, qk_norm=True,
        layer_types=("sliding_attention", "full_attention"),
        act="gelu_tanh", rms_offset=1.0, rope_local_theta=10000.0)
    bits, B, T, pos = 4, 8, 64, 40
    sp, mp, kc, vc, x, cos_g, sin_g = _setup(rng, cfg, B, T, pos, bits)
    half = cfg.head_dim // 2
    ang = rng.uniform(0, 2 * np.pi, size=(half,)).astype(np.float32)
    cos_l, sin_l = jnp.asarray(np.cos(ang)), jnp.asarray(np.sin(ang))
    kv_dim = cfg.num_key_value_heads * cfg.head_dim
    kw = dict(q_dim=cfg.q_dim, kv_dim=kv_dim, head_dim=cfg.head_dim,
              rotary_dim=cfg.head_dim, eps=1e-5, rms_offset=1.0,
              act="gelu_tanh", scale=float(1.0 / np.sqrt(cfg.head_dim)))
    lw = _lw_list(cfg, sp)
    for i, l in enumerate(lw):
        l["window"] = cfg.layer_window(i)
        if l["window"] is not None:        # sliding layers use local rope
            l["cos_half"], l["sin_half"] = cos_l, sin_l
    ref_y, ref_k, ref_v = megastep_lowbit_reference(x, lw, kc, vc, pos,
                                                    cos_g, sin_g, **kw)
    L = cfg.num_hidden_layers
    windows = jnp.asarray([cfg.layer_window(i) or T for i in range(L)],
                          jnp.int32)
    rope_sel = jnp.asarray([1 if cfg.layer_window(i) is not None else 0
                            for i in range(L)], jnp.int32)
    B_ = B
    ch = jnp.stack([jnp.broadcast_to(cos_g[None], (B_, half)),
                    jnp.broadcast_to(cos_l[None], (B_, half))])
    sh = jnp.stack([jnp.broadcast_to(sin_g[None], (B_, half)),
                    jnp.broadcast_to(sin_l[None], (B_, half))])
    with _ctx():
        y, kn, vn = megastep_lowbit_decode(x, mp, kc, vc, jnp.int32(pos),
                                           ch, sh, block_t=64, bits=bits,
                                           windows=windows,
                                           rope_sel=rope_sel, **kw)
    _assert_close_rel(kn, ref_k)
    _assert_close_rel(y, ref_y)


@pytest.mark.parametrize("bits,B", [(4, 8), (3, 8), (8, 12)])
def test_megastep_lowbit_asym(rng, bits, B):
    """Asymmetric (zeros) uniform artifacts ride the plane megastep via the
    streamed sz = scale*(center-zero) correction (VERDICT r3 #4): kernel
    output matches the dequantized-oracle reference, which applies zeros
    through dequantize_weight."""
    cfg = _cfg()
    T, pos = 64, 30
    sp, mp, kc, vc, x, cos, sin = _setup(rng, cfg, B, T, pos, bits,
                                         asym=True)
    assert "qkv_sz" in mp
    kv_dim = cfg.num_key_value_heads * cfg.head_dim
    kw = dict(q_dim=cfg.q_dim, kv_dim=kv_dim, head_dim=cfg.head_dim,
              rotary_dim=cfg.head_dim, eps=1e-5,
              scale=float(1.0 / np.sqrt(cfg.head_dim)))
    lw = _lw_list(cfg, sp)
    ref_y, ref_k, ref_v = megastep_lowbit_reference(x, lw, kc, vc, pos,
                                                    cos, sin, **kw)
    with _ctx():
        y, kn, vn = megastep_lowbit_decode(x, mp, kc, vc, jnp.int32(pos),
                                           cos, sin, block_t=64, bits=bits,
                                           **kw)
    np.testing.assert_allclose(np.asarray(kn, np.float32),
                               np.asarray(ref_k, np.float32),
                               atol=5e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(ref_y, np.float32),
                               atol=8e-2, rtol=5e-2)


@pytest.mark.parametrize("bits", [2, 3, 4, 8])
def test_plane_codec_exact(rng, bits):
    """derive + masked dots + recover == the centered integer matmul,
    EXACTLY: z_r = x8 @ (q_r - 2^(b-1)) with sum-of-x folded in."""
    metas, coef, nd, g_r = _plan_meta(bits)
    tile, K, Bx = 4 * g_r, 32, 5
    R = 2 * tile
    codes = rng.integers(0, 2 ** bits, size=(R, K)).astype(np.int64)
    xs = rng.integers(-127, 128, size=(Bx, K)).astype(np.int64)
    packed = _plane_pack(codes, tile, bits)
    assert packed.shape == (len(metas) * R // g_r, K)
    tF = tile // g_r
    pt = len(metas) * tF                      # packed rows per tile
    want = xs @ (codes - 2 ** (bits - 1)).T   # [Bx, R]
    S = jnp.asarray(xs.sum(axis=1, keepdims=True), jnp.int32)
    for t in range(R // tile):
        bg = jnp.asarray(packed[t * pt:(t + 1) * pt], jnp.int8)
        der = _derive(bg, tF, metas)
        dd = jnp.concatenate(
            [jnp.asarray(xs, jnp.int32) @ m.astype(jnp.int32).T
             for m in der], axis=1)
        zs = _recover(dd, tF, metas, coef, S)
        got = np.concatenate([np.asarray(z) for z in zs], axis=1)
        np.testing.assert_array_equal(
            got, want[:, t * tile:(t + 1) * tile])


def test_megastep_lowbit_greedy_decode_path(rng, monkeypatch):
    """greedy_decode routed through the W3 megastep scan (GANQ_MEGASTEP=1
    on CPU -> interpret mode) agrees with the reference-backend decode."""
    from ganq_tpu.serve import stacked

    monkeypatch.setenv("GANQ_MEGASTEP", "1")
    cfg = _cfg(layers=2)
    B, prompt, steps, T = 4, 8, 4, 64
    sp, mp, _, _, _, _, _ = _setup(rng, cfg, B, T, 1, 3)
    assert stacked.mega_enabled(cfg, sp, "reference", B) == "w3"
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(B, prompt)),
                      jnp.int32)
    ck, cv = stacked.init_cache(cfg, cfg.num_hidden_layers, B, T)
    toks = np.asarray(stacked.greedy_decode(cfg, sp, ck, cv, ids, steps,
                                            "reference"))
    monkeypatch.setenv("GANQ_MEGASTEP", "0")
    ck, cv = stacked.init_cache(cfg, cfg.num_hidden_layers, B, T)
    ref = np.asarray(stacked.greedy_decode(cfg, sp, ck, cv, ids, steps,
                                           "reference"))
    agree = (toks == ref).mean()
    assert agree >= 0.9, f"token agreement {agree:.2f}\n{toks}\n{ref}"


def test_batching_w3_megastep_fast_path(rng, monkeypatch):
    """Continuous batching through the W3 plane megastep (per-slot positions
    in ONE whole-stack kernel) matches the per-layer path."""
    from ganq_tpu.models import synthetic
    from ganq_tpu.serve.batching import BatchingEngine

    monkeypatch.setenv("GANQ_MEGASTEP", "1")
    cfg = synthetic.llama_config(hidden=1024, inter=1024, layers=2, heads=8,
                                 kv_heads=4, vocab=512, max_pos=128)
    params = synthetic.make_model(cfg, kind="uniform", seed=6, bits=3)
    prompts = [rng.integers(1, 512, size=(n,)) for n in (5, 9)]

    eng = BatchingEngine(cfg, params, backend="reference", slots=2,
                         max_seq=64, prompt_buckets=(8, 16))
    assert eng._mega_kv is not None, "mega fast path did not engage"
    assert eng._mega_variant == "w3"
    for p in prompts:
        eng.submit(p, max_new_tokens=4)
    got = eng.run_all()

    monkeypatch.setenv("GANQ_MEGASTEP", "0")
    eng2 = BatchingEngine(cfg, params, backend="reference", slots=2,
                          max_seq=64, prompt_buckets=(8, 16))
    assert eng2._mega_kv is None
    for p in prompts:
        eng2.submit(p, max_new_tokens=4)
    ref = eng2.run_all()

    assert set(got) == set(ref)
    n_tok = sum(len(v) for v in ref.values())
    n_agree = sum((np.asarray(got[k]) == np.asarray(ref[k])).sum()
                  for k in ref)
    assert n_agree >= 0.9 * n_tok, (got, ref)


@pytest.mark.parametrize("bits", [4, 3])
def test_megastep_lowbit_lm_fold(rng, bits):
    """Trailing-unembed fold: the kernel's vocab phases (final rmsnorm ->
    per-row int8 quant -> lm tile dots) must match the same math computed
    on the kernel's own residual output."""
    from ganq_tpu.models import synthetic
    from ganq_tpu.ops.megastep_lowbit import mega_lm_operands

    cfg = _cfg()
    B, T, pos = 4, 64, 17
    sp = synthetic.make_stacked_model(cfg, kind="uniform", seed=3,
                                      bits=bits, lm_head_kind="w8")
    L, H = cfg.num_hidden_layers, cfg.hidden_size
    sp["final_norm"]["weight"] = jnp.asarray(
        rng.uniform(0.5, 1.5, size=(H,)).astype(np.float32))
    lm_ops = mega_lm_operands(cfg, sp)
    assert lm_ops is not None
    mp = megapack_lowbit(cfg, sp, bits)
    Hkv = cfg.num_key_value_heads
    d = cfg.head_dim
    kc = jnp.asarray(rng.normal(size=(L, B * Hkv, T, d)) * 0.3,
                     jnp.bfloat16)
    vc = jnp.asarray(rng.normal(size=(L, B * Hkv, T, d)) * 0.3,
                     jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(B, H)) * 0.4, jnp.bfloat16)
    half = d // 2
    ang = rng.uniform(0, 2 * np.pi, size=(half,)).astype(np.float32)
    cos, sin = jnp.asarray(np.cos(ang)), jnp.asarray(np.sin(ang))
    kv_dim = Hkv * d
    kw = dict(q_dim=cfg.q_dim, kv_dim=kv_dim, head_dim=d, rotary_dim=d,
              eps=1e-5, scale=float(1.0 / np.sqrt(d)), block_t=64,
              bits=bits)
    with _ctx():
        y0, k0, v0 = megastep_lowbit_decode(x, mp, kc, vc, jnp.int32(pos),
                                            cos, sin, **kw)
        y1, k1, v1, lg = megastep_lowbit_decode(x, mp, kc, vc,
                                                jnp.int32(pos), cos, sin,
                                                lm=lm_ops, **kw)
    np.testing.assert_allclose(np.asarray(y1, np.float32),
                               np.asarray(y0, np.float32), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(k1, np.float32),
                                  np.asarray(k0, np.float32))
    # expected logits from the kernel's residual: final norm -> per-row
    # int8 quant -> int8 dot -> scales (the exact math of the vocab phases)
    xf = np.asarray(y0, np.float32)
    var = (xf * xf).mean(axis=1, keepdims=True)
    xf = xf / np.sqrt(var + 1e-5) * np.asarray(sp["final_norm"]["weight"],
                                               np.float32)
    sx = np.maximum(np.abs(xf).max(axis=1, keepdims=True) / 127.0, 1e-12)
    x8 = np.clip(np.round(xf / sx), -127, 127)
    w8 = np.asarray(sp["lm_head"]["w8"], np.float32)
    sw = np.asarray(sp["lm_head"]["scale"], np.float32).reshape(1, -1)
    want = (x8 @ w8.T) * sx * sw
    # the kernel quantizes its f32-resident residual; ``want`` starts from
    # the bf16-rounded y0, so differences are bf16 rounding only
    np.testing.assert_allclose(np.asarray(lg, np.float32), want,
                               atol=5e-2, rtol=5e-2)
    corr = np.corrcoef(np.asarray(lg, np.float32).ravel(), want.ravel())[0, 1]
    assert corr > 0.9999, corr


@pytest.mark.parametrize("bits", [4, 3])
def test_megastep_lowbit_biased_projections(rng, bits):
    """o/gate/up/down biases stream into the kernel (VERDICT r2 #4c —
    the reference's exllama serves biased models in-kernel too)."""
    cfg = _cfg()
    B, pos, T = 8, 50, 64
    sp, mp, kc, vc, x, cos, sin = _setup(rng, cfg, B, T, pos, bits,
                                         bias=True)
    kv_dim = cfg.num_key_value_heads * cfg.head_dim
    kw = dict(q_dim=cfg.q_dim, kv_dim=kv_dim, head_dim=cfg.head_dim,
              rotary_dim=cfg.head_dim, eps=1e-5,
              scale=float(1.0 / np.sqrt(cfg.head_dim)))
    lw = _lw_list(cfg, sp)
    assert "o_bias" in lw[0] and "gate_bias" in lw[0]  # biases in play
    ref_y, ref_k, ref_v = megastep_lowbit_reference(x, lw, kc, vc, pos,
                                                    cos, sin, **kw)
    # the bias must actually matter: a bias-free oracle run differs
    lw0 = [{k: v for k, v in l.items()
            if k not in ("o_bias", "gate_bias", "up_bias", "down_bias")}
           for l in lw]
    y0, _, _ = megastep_lowbit_reference(x, lw0, kc, vc, pos, cos, sin, **kw)
    assert not np.allclose(np.asarray(ref_y, np.float32),
                           np.asarray(y0, np.float32), atol=1e-3)
    with _ctx():
        y, kn, vn = megastep_lowbit_decode(x, mp, kc, vc, jnp.int32(pos),
                                           cos, sin, block_t=64, bits=bits,
                                           **kw)
    # kv tolerance: one bf16 ulp wider than the unbiased test — the bias
    # add shifts values across bf16 rounding boundaries
    np.testing.assert_allclose(np.asarray(kn, np.float32),
                               np.asarray(ref_k, np.float32),
                               atol=3e-2, rtol=3e-2)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(ref_y, np.float32),
                               atol=5e-2, rtol=5e-2)


def _inject_gidx(rng, sp, which=("qkv", "o", "gu", "dn")):
    """Turn sequential-group stacked uniform artifacts into act-order ones:
    shuffle each matrix's input columns by a random per-layer permutation
    and record g_idx accordingly (a balanced, perm-derived act order — the
    shape desc_act/act_sort artifacts have). The dequantized weights stay
    valid (dequantize_weight honors g_idx), so the megastep4 oracle on
    them is the parity reference."""
    import jax.numpy as jnp

    from ganq_tpu.ops.packing import pack_int_rows, unpack_int_rows

    ls = sp["layers_stacked"]
    mats = {"qkv": ls["attn"]["qkv"], "o": ls["attn"]["o"],
            "gu": ls["mlp"]["gateup"], "dn": ls["mlp"]["down"]}
    for k in which:
        m = mats[k]
        L = m["qweight"].shape[0]
        n = m.in_features
        gs = n // m["scales"].shape[2]
        qws, gidx = [], []
        for l in range(L):
            p = rng.permutation(n)
            codes = np.asarray(unpack_int_rows(m["qweight"][l], m.bits, n))
            qws.append(np.asarray(pack_int_rows(
                jnp.asarray(codes[:, p]), m.bits)))
            gidx.append((p // gs).astype(np.int32))
        m.arrays["qweight"] = jnp.asarray(np.stack(qws))
        m.arrays["g_idx"] = jnp.asarray(np.stack(gidx))


@pytest.mark.parametrize("bits,B,which,asym", [
    (4, 8, ("qkv", "o", "gu", "dn"), False),
    (3, 4, ("dn",), False),       # pack-time-only remap (no runtime masks)
    # asym (zeros) composed with act-order: down's g_idx triggers the
    # gate/up OUTPUT-row permutation, which must carry "zeros" along with
    # scales (r4 advisor high: a missing zeros row_perm silently corrupts
    # every MLP output on gptq-v1 sym=False + desc_act checkpoints)
    (4, 8, ("qkv", "o", "gu", "dn"), True),
    (3, 4, ("dn",), True),
])
def test_megastep_lowbit_actorder(rng, bits, B, which, asym):
    """Act-order (g_idx) artifacts through the Beneš activation remap
    (ops/lane_perm + actorder_transform) match the dequantized oracle —
    the exllama column_remap capability, TPU-native (VERDICT r2 #4b)."""
    from ganq_tpu.ops.megastep_lowbit import actorder_transform

    cfg = _cfg()
    pos, T = 20, 64
    sp, _, kc, vc, x, cos, sin = _setup(rng, cfg, B, T, pos, bits,
                                        asym=asym)
    _inject_gidx(rng, sp, which)
    assert megastep_lowbit_fusable(cfg, sp, bits)
    tsp, masks = actorder_transform(cfg, sp, bits)
    assert ("ap_q" in masks) == any(k in which for k in ("qkv", "o", "gu"))
    mp = dict(megapack_lowbit(cfg, tsp, bits))
    mp.update(masks)

    kv_dim = cfg.num_key_value_heads * cfg.head_dim
    kw = dict(q_dim=cfg.q_dim, kv_dim=kv_dim, head_dim=cfg.head_dim,
              rotary_dim=cfg.head_dim, eps=1e-5,
              scale=float(1.0 / np.sqrt(cfg.head_dim)))
    lw = _lw_list(cfg, sp)              # dequantizes WITH g_idx (original)
    ref_y, ref_k, ref_v = megastep_lowbit_reference(x, lw, kc, vc, pos,
                                                    cos, sin, **kw)
    with _ctx():
        y, kn, vn = megastep_lowbit_decode(x, mp, kc, vc, jnp.int32(pos),
                                           cos, sin, block_t=64, bits=bits,
                                           **kw)
    # asym widens the y tolerance to the test_megastep_lowbit_asym bound:
    # a single int8 activation-code flip also shifts the group sum S by 1,
    # adding +-sz (~scale * center) on top of the weight-code delta
    y_atol = 8e-2 if asym else 5e-2
    np.testing.assert_allclose(np.asarray(kn, np.float32),
                               np.asarray(ref_k, np.float32),
                               atol=3e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(vn, np.float32),
                               np.asarray(ref_v, np.float32),
                               atol=3e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(ref_y, np.float32),
                               atol=y_atol, rtol=5e-2)


def test_megastep_actorder_greedy_serving(rng, monkeypatch):
    """Act-order artifacts through the FULL serving wiring: prepack bakes
    the transform (actorder_transform) + attaches the routing masks, and
    greedy_decode through the megastep matches the per-layer reference
    path on the ORIGINAL g_idx artifacts (VERDICT r2 #4b done-criteria)."""
    from ganq_tpu.serve import stacked

    monkeypatch.setenv("GANQ_MEGASTEP", "1")
    cfg = _cfg(layers=2)
    B, prompt, steps, T = 4, 8, 4, 64
    sp, _, _, _, _, _, _ = _setup(rng, cfg, B, T, 1, 3)
    _inject_gidx(rng, sp, ("qkv", "o", "gu", "dn"))
    assert stacked.mega_enabled(cfg, sp, "reference", B) == "w3"
    psp = stacked.prepack(cfg, sp, "reference", B)
    assert "megapack_lb" in psp and "ap_q" in psp["megapack_lb"]
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(B, prompt)),
                      jnp.int32)
    ck, cv = stacked.init_cache(cfg, cfg.num_hidden_layers, B, T)
    toks = np.asarray(stacked.greedy_decode(cfg, psp, ck, cv, ids, steps,
                                            "reference"))
    monkeypatch.setenv("GANQ_MEGASTEP", "0")
    ck, cv = stacked.init_cache(cfg, cfg.num_hidden_layers, B, T)
    ref = np.asarray(stacked.greedy_decode(cfg, sp, ck, cv, ids, steps,
                                           "reference"))
    agree = (toks == ref).mean()
    assert agree >= 0.9, f"token agreement {agree:.2f}\n{toks}\n{ref}"


def _inject_lora(rng, sp, rank=16):
    """Attach random EoRA adapters to all four stacked projections (the
    kernel's all-or-nothing gate) and return oracle-side per-layer arrays.
    Factors are cast to bf16 first — the kernel streams them bf16, so the
    oracle must see the identical values."""
    import jax.numpy as jnp

    ls = sp["layers_stacked"]
    mats = {"qkv": ls["attn"]["qkv"], "o": ls["attn"]["o"],
            "gu": ls["mlp"]["gateup"], "dn": ls["mlp"]["down"]}
    oracle = {}
    for k, m in mats.items():
        L = m["qweight"].shape[0]
        n_in = m.in_features
        n_out = m["scales"].shape[1]
        la = (rng.normal(size=(L, rank, n_in)) * 0.02).astype(np.float32)
        lb = (rng.normal(size=(L, n_out, rank)) * 0.02).astype(np.float32)
        la = np.asarray(jnp.asarray(la, jnp.bfloat16), np.float32)
        lb = np.asarray(jnp.asarray(lb, jnp.bfloat16), np.float32)
        m.arrays["lora_a"] = jnp.asarray(la)
        m.arrays["lora_b"] = jnp.asarray(lb)
        oracle[k] = (la, lb)
    return oracle


@pytest.mark.parametrize("bits,B,actorder", [
    (4, 8, False),
    (3, 4, False),
    (4, 8, True),                 # EoRA epilogue composed with act-order
])
def test_megastep_lowbit_eora_epilogue(rng, bits, B, actorder):
    """EoRA rank-r adapters as a fused in-kernel epilogue (the
    exllama_eora fused-GEMM analog, VERDICT r2 #4d): kernel matches the
    oracle's full-precision adapter math on pre-quantization activations."""
    from ganq_tpu.ops.megastep_lowbit import actorder_transform

    cfg = _cfg()
    pos, T = 20, 64
    sp, _, kc, vc, x, cos, sin = _setup(rng, cfg, B, T, pos, bits)
    oracle_lora = _inject_lora(rng, sp)
    if actorder:
        _inject_gidx(rng, sp, ("qkv", "o", "gu", "dn"))
    assert megastep_lowbit_fusable(cfg, sp, bits)
    tsp, masks = actorder_transform(cfg, sp, bits)
    mp = dict(megapack_lowbit(cfg, tsp, bits))
    mp.update(masks)
    assert "la_q" in mp

    kv_dim = cfg.num_key_value_heads * cfg.head_dim
    kw = dict(q_dim=cfg.q_dim, kv_dim=kv_dim, head_dim=cfg.head_dim,
              rotary_dim=cfg.head_dim, eps=1e-5,
              scale=float(1.0 / np.sqrt(cfg.head_dim)))
    lw = _lw_list(cfg, sp)
    for i, lwd in enumerate(lw):
        lwd["qkv_la"] = jnp.asarray(oracle_lora["qkv"][0][i])
        lwd["qkv_lb"] = jnp.asarray(oracle_lora["qkv"][1][i])
        lwd["o_la"] = jnp.asarray(oracle_lora["o"][0][i])
        lwd["o_lb"] = jnp.asarray(oracle_lora["o"][1][i])
        lwd["gu_la"] = jnp.asarray(oracle_lora["gu"][0][i])
        lwd["gu_lb"] = jnp.asarray(oracle_lora["gu"][1][i])
        lwd["down_la"] = jnp.asarray(oracle_lora["dn"][0][i])
        lwd["down_lb"] = jnp.asarray(oracle_lora["dn"][1][i])
    ref_y, ref_k, ref_v = megastep_lowbit_reference(x, lw, kc, vc, pos,
                                                    cos, sin, **kw)
    with _ctx():
        y, kn, vn = megastep_lowbit_decode(x, mp, kc, vc, jnp.int32(pos),
                                           cos, sin, block_t=64, bits=bits,
                                           **kw)
    np.testing.assert_allclose(np.asarray(kn, np.float32),
                               np.asarray(ref_k, np.float32),
                               atol=3e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(vn, np.float32),
                               np.asarray(ref_v, np.float32),
                               atol=3e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(ref_y, np.float32),
                               atol=5e-2, rtol=5e-2)
