"""Hymba hybrid-head architecture (VERDICT r2 #7; reference
models/definitions/hymba.py): attention∥SSM layers with one fused in_proj,
meta tokens, cross-layer KV reuse, quantization targets mamba.in_proj /
mamba.out_proj / the single-expert MLP.

The real Hymba is remote-code with no local HF oracle (the reference
requires trust_remote_code + the mamba_ssm CUDA package), so the functional
contract is pinned by the HANDWRITTEN numpy oracle below — an independent
reimplementation of the block from its mathematical definition, sharing no
code with ganq_tpu."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ganq_tpu.models import synthetic, transformer
from ganq_tpu.serve import engine as eng


# ------------------------------------------------------------- numpy oracle
def _np_rms(x, w, eps=1e-5):
    var = np.mean(x.astype(np.float32) ** 2, axis=-1, keepdims=True)
    return x / np.sqrt(var + eps) * w


def _np_silu(x):
    return x / (1.0 + np.exp(-x))


def _np_softplus(x):
    return np.logaddexp(x, 0.0)


def _np_rope(x, pos, theta=10000.0):
    """x [B, T, Hh, d]; HF rotate_half layout."""
    B, T, Hh, d = x.shape
    inv = 1.0 / theta ** (np.arange(0, d, 2) / d)
    f = pos[:, None] * inv[None, :]                       # [T, d/2]
    cos = np.concatenate([np.cos(f), np.cos(f)], -1)      # [T, d]
    sin = np.concatenate([np.sin(f), np.sin(f)], -1)
    lo, hi = x[..., :d // 2], x[..., d // 2:]
    rot = np.concatenate([-hi, lo], axis=-1)
    return x * cos[None, :, None, :] + rot * sin[None, :, None, :]


def _np_attn(q, k, v, scale):
    """Causal GQA. q [B,T,Hq,d]; k,v [B,T,Hkv,d]."""
    B, T, Hq, d = q.shape
    Hkv = k.shape[2]
    g = Hq // Hkv
    out = np.zeros_like(q)
    mask = np.tril(np.ones((T, T), bool))
    for h in range(Hq):
        kk, vv = k[:, :, h // g], v[:, :, h // g]
        s = np.einsum("btd,bsd->bts", q[:, :, h], kk) * scale
        s = np.where(mask[None], s, -1e30)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        out[:, :, h] = np.einsum("bts,bsd->btd", p, vv)
    return out


def _np_hymba_forward(cfg, params, ids):
    """Independent full-model reimplementation (f32)."""
    g = lambda a: np.asarray(a, np.float32)
    B, S = ids.shape
    m = cfg.num_meta_tokens
    emb = g(params["embed_tokens"]["weight"])
    x = emb[ids]
    if m:
        meta = g(params["meta_tokens"])
        x = np.concatenate([np.broadcast_to(meta[None], (B, m, meta.shape[1])),
                            x], axis=1)
    T = S + m
    pos = np.arange(T, dtype=np.float64)
    d = cfg.head_dim
    Hq, Hkv = cfg.num_attention_heads, cfg.num_key_value_heads
    N = cfg.ssm_state
    kvs = []
    for li, lp in enumerate(params["layers"]):
        mp = lp["mamba"]
        h = _np_rms(x, g(lp["input_norm"]["weight"]), cfg.norm_eps)
        proj = h @ g(mp["in_proj"]["weight"]).T
        Di = g(mp["A_log"]).shape[0]
        q_dim, kv_dim = Hq * d, Hkv * d
        xs = proj[..., :Di]
        z = proj[..., Di:2 * Di]
        q = proj[..., 2 * Di:2 * Di + q_dim].reshape(B, T, Hq, d)
        k = proj[..., 2 * Di + q_dim:2 * Di + q_dim + kv_dim].reshape(
            B, T, Hkv, d)
        v = proj[..., 2 * Di + q_dim + kv_dim:].reshape(B, T, Hkv, d)

        # SSM branch: depthwise causal conv -> silu -> x_proj -> scan
        K = g(mp["conv_w"]).shape[0]
        xp = np.concatenate([np.zeros((B, K - 1, Di), np.float32), xs],
                            axis=1)
        conv = sum(g(mp["conv_w"])[kk] * xp[:, kk:kk + T]
                   for kk in range(K)) + g(mp["conv_b"])
        u = _np_silu(conv)
        dbc = u @ g(mp["x_proj"]["weight"]).T
        dtr = dbc.shape[-1] - 2 * N
        dt = _np_softplus(dbc[..., :dtr] @ g(mp["dt_proj"]["weight"]).T
                          + g(mp["dt_proj"]["bias"]))
        Bc, Cc = dbc[..., dtr:dtr + N], dbc[..., dtr + N:]
        A = -np.exp(g(mp["A_log"]))                       # [Di, N]
        hs = np.zeros((B, Di, N), np.float32)
        y_ssm = np.zeros((B, T, Di), np.float32)
        for t in range(T):
            dA = np.exp(dt[:, t, :, None] * A[None])
            hs = hs * dA + (dt[:, t] * u[:, t])[..., None] * Bc[:, t, None, :]
            y_ssm[:, t] = np.einsum("bdn,bn->bd", hs, Cc[:, t])
        y_ssm = (y_ssm + g(mp["D"]) * u) * _np_silu(z)
        y_ssm = _np_rms(y_ssm, g(mp["ssm_norm"]["weight"]), cfg.norm_eps)

        # attention branch (with optional cross-layer KV reuse)
        q = _np_rope(q, pos, cfg.rope_theta)
        k = _np_rope(k, pos, cfg.rope_theta)
        if cfg.kv_reuse_map is not None and cfg.kv_reuse_map[li] != li:
            k, v = kvs[cfg.kv_reuse_map[li]]
        kvs.append((k, v))
        y_attn = _np_attn(q, k, v, 1.0 / np.sqrt(d)).reshape(B, T, -1)
        y_attn = _np_rms(y_attn, g(mp["attn_norm"]["weight"]), cfg.norm_eps)

        ymix = 0.5 * (y_attn + y_ssm)
        x = x + ymix @ g(mp["out_proj"]["weight"]).T

        h2 = _np_rms(x, g(lp["post_norm"]["weight"]), cfg.norm_eps)
        a = _np_silu(h2 @ g(lp["mlp"]["gate"]["weight"]).T) \
            * (h2 @ g(lp["mlp"]["up"]["weight"]).T)
        x = x + a @ g(lp["mlp"]["down"]["weight"]).T
    x = _np_rms(x, g(params["final_norm"]["weight"]), cfg.norm_eps)
    logits = x @ emb.T
    return logits[:, m:]


# -------------------------------------------------------------------- tests
@pytest.mark.parametrize("reuse", [None, (0, 0, 2)])
def test_hymba_forward_matches_numpy_oracle(rng, reuse):
    cfg = synthetic.hymba_config(kv_reuse_map=reuse)
    params = synthetic.make_hymba_model(cfg, kind="dense", seed=1,
                                        dtype=jnp.float32)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 9))
    got = np.asarray(transformer.forward(cfg, params, jnp.asarray(ids)),
                     np.float32)
    want = _np_hymba_forward(cfg, params, ids)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_hymba_prefill_decode_matches_forward(rng):
    """Streaming state (KV + conv + SSM recurrence + meta offset) hands off
    prefill -> one-token decode exactly: per-position logits match the
    cache-free full forward."""
    cfg = synthetic.hymba_config(kv_reuse_map=(0, 0, 2))
    params = synthetic.make_hymba_model(cfg, kind="dense", seed=2,
                                        dtype=jnp.float32)
    S, extra = 6, 3
    ids = rng.integers(0, cfg.vocab_size, size=(1, S + extra))
    full = np.asarray(transformer.forward(cfg, params, jnp.asarray(ids)),
                      np.float32)

    cache = eng.init_cache(cfg, 1, 32, dtype=jnp.float32)
    logits, cache = eng.prefill(cfg, params, cache, jnp.asarray(ids[:, :S]))
    np.testing.assert_allclose(np.asarray(logits), full[:, S - 1],
                               atol=2e-3, rtol=2e-3)
    m = cfg.num_meta_tokens
    for t in range(extra):
        logits, cache = eng.decode_step(
            cfg, params, cache, jnp.asarray(ids[:, S + t]),
            jnp.int32(m + S + t))
        np.testing.assert_allclose(np.asarray(logits), full[:, S + t],
                                   atol=2e-3, rtol=2e-3)


def test_hymba_generate_runs(rng):
    cfg = synthetic.hymba_config()
    params = synthetic.make_hymba_model(cfg, kind="dense", seed=3)
    e = eng.Engine(cfg=cfg, params=params, max_seq=64)
    out = e.generate(rng.integers(0, cfg.vocab_size, size=(2, 5)),
                     max_new_tokens=4)
    assert out.shape == (2, 4)


def test_hymba_quantize_serve_journey(rng):
    """quantize -> artifacts on the reference's target modules -> quantized
    Engine serving agrees with the fake-quant forward (VERDICT r2 #7
    done-criteria: registry entry + quantize->serve journey)."""
    from ganq_tpu.core.config import QuantizeConfig
    from ganq_tpu.models.registry import get_spec
    from ganq_tpu.quant.looper import packed_params, quantize_model

    cfg = synthetic.hymba_config(meta_tokens=2)
    params = synthetic.make_hymba_model(cfg, kind="dense", seed=4,
                                        dtype=jnp.float32)
    spec = get_spec("hymba")
    batches = [rng.integers(0, cfg.vocab_size, size=(2, 16)).astype(np.int32)
               for _ in range(2)]
    qcfg = QuantizeConfig(bits=4, group_size=64, sym=True, act_sort="none",
                          quant_method="gptq")
    out = quantize_model(cfg, params, spec, qcfg, batches)
    names = set(out.artifacts)
    for want in ("mamba.in_proj", "mamba.out_proj", "moe.experts.0.gate_proj",
                 "moe.experts.0.down_proj"):
        assert any(n.endswith(want) for n in names), (want, names)

    qparams = packed_params(spec, out)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 8))
    ref = np.asarray(transformer.forward(cfg, out.params, jnp.asarray(ids)),
                     np.float32)
    got = np.asarray(transformer.forward(cfg, qparams, jnp.asarray(ids)),
                     np.float32)
    np.testing.assert_allclose(got, ref, atol=0.35, rtol=0.1)

    e = eng.Engine(cfg=cfg, params=qparams, max_seq=64)
    toks = e.generate(ids, max_new_tokens=4)
    assert toks.shape == (1, 4)


def test_hymba_shared_kv_calibration(rng, monkeypatch):
    """kv-reuse consumers calibrate on the PRODUCER's fresh k/v (VERDICT
    r3 #7, reference module_looper.py:305-313): the quantized artifacts
    differ from own-KV calibration (GANQ_HYMBA_OWNKV=1), and the shared-KV
    quantized model still serves with fake-quant parity."""
    import copy

    from ganq_tpu.core.config import QuantizeConfig
    from ganq_tpu.models.registry import get_spec
    from ganq_tpu.quant.looper import packed_params, quantize_model

    cfg = synthetic.hymba_config(layers=3, kv_reuse_map=(0, 0, 2),
                                 meta_tokens=2)
    params = synthetic.make_hymba_model(cfg, kind="dense", seed=11,
                                        dtype=jnp.float32)
    spec = get_spec("hymba")
    batches = [rng.integers(0, cfg.vocab_size, size=(2, 16)).astype(np.int32)]
    qcfg = QuantizeConfig(bits=4, group_size=64, sym=True, act_sort="none",
                          quant_method="gptq")

    out_shared = quantize_model(cfg, copy.deepcopy(params), spec, qcfg,
                                batches)
    monkeypatch.setenv("GANQ_HYMBA_OWNKV", "1")
    out_own = quantize_model(cfg, copy.deepcopy(params), spec, qcfg, batches)
    monkeypatch.delenv("GANQ_HYMBA_OWNKV")

    # the consumer layer (1, reusing layer 0's kv) sees a different
    # activation distribution -> its out_proj codes differ; the producer
    # layer 0 is identical in both modes (nothing upstream changed)
    name1 = next(n for n in out_shared.artifacts
                 if n.endswith("1.mamba.out_proj"))
    name0 = next(n for n in out_shared.artifacts
                 if n.endswith("0.mamba.in_proj"))
    np.testing.assert_array_equal(
        np.asarray(out_shared.artifacts[name0].qidx),
        np.asarray(out_own.artifacts[name0].qidx))
    assert not np.array_equal(
        np.asarray(out_shared.artifacts[name1].qidx),
        np.asarray(out_own.artifacts[name1].qidx))

    # the shared-KV-calibrated model serves: packed vs fake-quant parity
    qparams = packed_params(spec, out_shared)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 8))
    ref = np.asarray(transformer.forward(cfg, out_shared.params,
                                         jnp.asarray(ids)), np.float32)
    got = np.asarray(transformer.forward(cfg, qparams, jnp.asarray(ids)),
                     np.float32)
    np.testing.assert_allclose(got, ref, atol=0.35, rtol=0.1)


def test_hymba_continuous_batching_parity(rng):
    """Hymba on the continuous-batching path (VERDICT r4 #7): per-slot
    vector cache positions + meta-token offsets + cross-layer KV reuse
    through BatchingEngine must reproduce the per-sequence engine's greedy
    tokens. Exercises both admission branches (exact-bucket and padded)."""
    from ganq_tpu.serve.batching import BatchingEngine

    cfg = synthetic.hymba_config(kv_reuse_map=(0, 0, 2))
    params = synthetic.make_hymba_model(cfg, kind="dense", seed=5)
    prompts = [rng.integers(0, cfg.vocab_size, size=5),
               rng.integers(0, cfg.vocab_size, size=8),   # padded bucket
               rng.integers(0, cfg.vocab_size, size=16)]  # exact bucket
    n_new = 6

    e = eng.Engine(cfg=cfg, params=params, max_seq=64)
    refs = [np.asarray(e.generate(np.asarray(p)[None], n_new))[0]
            for p in prompts]

    be = BatchingEngine(cfg, params, backend="reference", slots=2,
                        max_seq=64, prompt_buckets=(16, 32))
    rids = [be.submit(p, max_new_tokens=n_new) for p in prompts]
    out = be.run_all()
    for rid, ref in zip(rids, refs):
        got = np.asarray(out[rid])
        agree = (got == ref[:len(got)]).mean()
        assert agree >= 0.9, (f"hymba batching disagrees: {got} vs {ref} "
                              f"(agree {agree:.2f})")
