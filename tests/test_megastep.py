"""Whole-decode-step megakernel (ops/megastep.py) vs its pure-jnp oracle,
plus greedy-decode parity of the megastep serving path (the reference's
kernel-testing pattern — oracle vs fused kernel, SURVEY.md §4)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from ganq_tpu.models import synthetic
from ganq_tpu.ops.megastep import (megapack, megastep_decode_w8a8,
                                   megastep_fusable, megastep_reference)
from ganq_tpu.serve import stacked


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _ctx():
    return (pltpu.force_tpu_interpret_mode()
            if not os.environ.get("GANQ_TPU_TEST_TPU") else _null())


def _cfg(layers=2, heads=2, kv_heads=1):
    # head_dim must be 128 for the megakernel
    return synthetic.llama_config(hidden=128 * heads, inter=512,
                                  layers=layers, heads=heads,
                                  kv_heads=kv_heads, vocab=512, max_pos=128)


def _setup(rng, cfg, B, T, pos):
    sp = synthetic.make_stacked_model(cfg, kind="w8", seed=3)
    # non-trivial norms so the in-kernel rmsnorms are exercised
    L, H = cfg.num_hidden_layers, cfg.hidden_size
    sp["layers_stacked"]["input_norm"]["weight"] = jnp.asarray(
        rng.uniform(0.5, 1.5, size=(L, H)).astype(np.float32))
    sp["layers_stacked"]["post_norm"]["weight"] = jnp.asarray(
        rng.uniform(0.5, 1.5, size=(L, H)).astype(np.float32))
    assert megastep_fusable(cfg, sp)
    mp = megapack(cfg, sp)
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
    # garbage beyond pos must never be attended
    kc = kc.at[:, :, pos:].set(23.0)
    vc = vc.at[:, :, pos:].set(-7.0)
    x = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32) * 0.4,
                    jnp.bfloat16)
    half = d // 2
    ang = rng.uniform(0, 2 * np.pi, size=(half,)).astype(np.float32)
    return sp, mp, kc, vc, x, jnp.asarray(np.cos(ang)), jnp.asarray(np.sin(ang))


@pytest.mark.parametrize("B,pos,T", [(8, 50, 64), (8, 3, 128), (4, 17, 64)])
def test_megastep_matches_reference(rng, B, pos, T):
    cfg = _cfg()
    sp, mp, kc, vc, x, cos, sin = _setup(rng, cfg, B, T, pos)
    kv_dim = cfg.num_key_value_heads * cfg.head_dim
    kw = dict(q_dim=cfg.q_dim, kv_dim=kv_dim, head_dim=cfg.head_dim,
              rotary_dim=cfg.head_dim, eps=1e-5,
              scale=float(1.0 / np.sqrt(cfg.head_dim)))
    ref_y, ref_k, ref_v = megastep_reference(x, mp, kc, vc, pos, cos, sin,
                                             **kw)
    with _ctx():
        y, kn, vn = megastep_decode_w8a8(x, mp, kc, vc, jnp.int32(pos),
                                         cos, sin, block_t=64, block_i=256,
                                         **kw)
    np.testing.assert_allclose(np.asarray(kn, np.float32),
                               np.asarray(ref_k, np.float32),
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(vn, np.float32),
                               np.asarray(ref_v, np.float32),
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(ref_y, np.float32),
                               atol=5e-2, rtol=5e-2)


def test_megastep_greedy_decode_path(rng, monkeypatch):
    """greedy_decode routed through the megastep scan (GANQ_MEGASTEP=1 on
    CPU -> interpret mode) matches a manual oracle decode loop."""
    monkeypatch.setenv("GANQ_MEGASTEP", "1")
    cfg = _cfg(layers=2)
    B, prompt, steps, T = 4, 8, 4, 64
    sp, mp, _, _, _, _, _ = _setup(rng, cfg, B, T, 1)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(B, prompt)),
                      jnp.int32)
    ck, cv = stacked.init_cache(cfg, cfg.num_hidden_layers, B, T)
    toks = np.asarray(stacked.greedy_decode(cfg, sp, ck, cv, ids, steps,
                                            "reference"))
    assert toks.shape == (B, steps)

    # oracle: prefill via the scan path, then megastep_reference decode steps
    from ganq_tpu.models.transformer import _rope_half_tables, rope_tables
    from ganq_tpu.models.transformer import embed, unembed
    ck, cv = stacked.init_cache(cfg, cfg.num_hidden_layers, B, T)
    logits, ck, cv = stacked.prefill(cfg, sp, ck, cv, ids, "reference")
    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    mk, mv = stacked._mega_cache(cfg, ck, cv)
    kv_dim = cfg.num_key_value_heads * cfg.head_dim
    out = [np.asarray(tok)]
    pos = prompt
    for _ in range(steps - 1):
        positions = jnp.broadcast_to(jnp.int32(pos), (B, 1))
        x = embed(cfg, sp, tok[:, None], positions)[:, 0, :]
        rd, cos_h, sin_h = _rope_half_tables(
            cfg, rope_tables(cfg, positions))
        y, kn, vn = megastep_reference(
            x, mp, mk, mv, pos, cos_h, sin_h, q_dim=cfg.q_dim,
            kv_dim=kv_dim, head_dim=cfg.head_dim, rotary_dim=rd,
            eps=cfg.norm_eps, scale=float(1.0 / np.sqrt(cfg.head_dim)))
        L = cfg.num_hidden_layers
        kn4 = kn.reshape(L, -1, 1, cfg.head_dim).astype(mk.dtype)
        vn4 = vn.reshape(L, -1, 1, cfg.head_dim).astype(mv.dtype)
        mk = jax.lax.dynamic_update_slice(mk, kn4, (0, 0, pos, 0))
        mv = jax.lax.dynamic_update_slice(mv, vn4, (0, 0, pos, 0))
        lg = unembed(cfg, sp, y[:, None, :])[:, 0, :]
        tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        out.append(np.asarray(tok))
        pos += 1
    oracle = np.stack(out, axis=1)
    # greedy argmax can flip on near-ties between kernel and oracle numerics;
    # demand overwhelming agreement rather than bitwise equality
    agree = (toks == oracle).mean()
    assert agree >= 0.9, f"token agreement {agree:.2f}\n{toks}\n{oracle}"
