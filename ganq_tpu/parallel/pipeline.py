"""Pipeline parallelism: GPipe-style staged forward over a "pipe" mesh axis.

The reference has no distributed backend (SURVEY §2.4); this is the TPU-native
pipeline tier for models whose layer stack exceeds one device's HBM even after
quantization. Design (the scaling-book pipelining recipe, not an NCCL
translation):

- layers are split into ``S`` contiguous stages; each stage's layers are
  stacked (leading layer axis, as in serve/stacked.py) and the stage axis is
  sharded over the mesh, so every device holds only its own stage's weights;
- the batch is split into ``M`` microbatches that flow through the stages
  under ``shard_map``: each tick every device runs its stage on its current
  activation and hands the result to the next stage with a single
  ``ppermute`` hop (neighbour traffic — rides ICI);
- embed/unembed run outside the pipe (they need the embedding table, which
  stays with the host stage in a real deployment);
- the classic GPipe bubble is ``(S-1)/(M+S-1)`` of the ticks — pick M >= S.

Decode (``PipelineRunner.generate_greedy``) keeps each stage's KV caches
RESIDENT on that stage's device ([L/S, M, mb, T, Hkv, D], sharded on
"pipe") and runs a schedule-deterministic token-interleaved pipeline:
microbatch m starts decode step k at tick ``m + k*R`` with period
``R = max(S, M)``, so every (tick, stage) pair maps to at most one
microbatch, utilization is min(1, M/S), and no cross-device counters are
needed — the whole schedule is a function of the tick index. The sampled
token is broadcast back to stage 0 with a masked psum each tick.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map            # jax >= 0.6 public export
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..models.transformer import (ModelConfig, causal_mask, embed,
                                  layer_forward, rope_tables_all, unembed)


def _bcast_psum(x: jax.Array, axis: str) -> jax.Array:
    """Masked-broadcast psum. On the CPU backend, bf16 all-reduces inside a
    partial-auto shard_map crash XLA's AllReducePromotion pass ("Invalid
    binary instruction opcode copy"), so promote via f32 there; the roundtrip
    is exact for pass-through values. TPU all-reduces bf16 natively."""
    if x.dtype == jnp.bfloat16 and jax.default_backend() == "cpu":
        return jax.lax.psum(x.astype(jnp.float32), axis).astype(jnp.bfloat16)
    return jax.lax.psum(x, axis)


def make_pipe_mesh(stages: int, model: int = 1, devices=None) -> Mesh:
    """1-D ("pipe",) mesh, or 2-D ("pipe", "model") for PP x TP: each stage
    owns ``model`` devices that tensor-shard the stage's weights."""
    devices = devices if devices is not None else jax.devices()
    need = stages * model
    if len(devices) < need:
        raise ValueError(f"{stages}x{model} mesh needs {need} devices, "
                         f"have {len(devices)}")
    if model == 1:
        return Mesh(np.asarray(devices[:stages]).reshape(stages), ("pipe",))
    return Mesh(np.asarray(devices[:need]).reshape(stages, model),
                ("pipe", "model"))


def stage_stack(params: Dict[str, Any], n_stages: int):
    """Stack params["layers"] into one pytree with leading [S, L/S] axes.

    Every layer must share one structure (same QLinear kinds/shapes) — the
    same homogeneity serve/stacked.py needs for its layer scan."""
    layers = params["layers"]
    L = len(layers)
    if L % n_stages:
        raise ValueError(f"{L} layers not divisible into {n_stages} stages")
    per = L // n_stages
    stages = [
        jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                               *layers[s * per:(s + 1) * per])
        for s in range(n_stages)
    ]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *stages)


@dataclasses.dataclass
class PipelineRunner:
    """Holds stage-sharded layer weights + replicated embed/unembed params."""
    cfg: ModelConfig
    mesh: Mesh
    staged: Any                 # [S, L/S, ...] leaves, stage axis sharded
    outer: Dict[str, Any]       # embed/unembed/norm params (replicated)
    backend: str = "reference"

    @classmethod
    def build(cls, cfg: ModelConfig, params: Dict[str, Any], mesh: Mesh,
              backend: str = "reference") -> "PipelineRunner":
        S = mesh.shape["pipe"]
        if cfg.sliding_window is not None or cfg.rope_local_theta is not None:
            # per-layer sliding windows ride the staged pytree as data so the
            # scanned stage body stays homogeneous (full layers get a no-op
            # window larger than any sequence)
            params = dict(params)
            params["layers"] = [
                dict(lp, window=jnp.int32(cfg.layer_window(i) or 2**30),
                     rope_local=jnp.bool_(cfg.layer_window(i) is not None))
                for i, lp in enumerate(params["layers"])]
        staged = stage_stack(params, S)
        tp = mesh.shape.get("model", 1)
        if tp > 1:
            # PP x TP: within each stage, weights are tensor-sharded over
            # "model" per the TP policy (parallel/sharding.py), with the two
            # stacking axes [S, L/S] prepended — "pipe" stays the manual
            # shard_map axis, "model" is left to GSPMD inside the stage body
            from .sharding import param_specs
            ls0 = dict(param_specs(cfg, params, tp)["layers"][0])
            for extra in ("window", "rope_local"):
                if extra in params["layers"][0]:
                    ls0[extra] = P()
            leaves, treedef = jax.tree_util.tree_flatten(staged)
            spec_leaves = treedef.flatten_up_to(ls0)
            staged = jax.tree_util.tree_unflatten(treedef, [
                jax.device_put(a, NamedSharding(
                    mesh, P("pipe", None, *tuple(s))))
                for a, s in zip(leaves, spec_leaves)])
        else:
            staged = jax.tree_util.tree_map(
                lambda a: jax.device_put(a, NamedSharding(mesh, P("pipe"))),
                staged)
        outer = {k: v for k, v in params.items() if k != "layers"}
        return cls(cfg, mesh, staged, outer, backend)

    @property
    def _shmap_kwargs(self) -> Dict[str, Any]:
        """Manual over "pipe" only; any "model" axis stays under GSPMD
        control inside the stage body (PP x TP composition)."""
        if len(self.mesh.axis_names) > 1:
            return {"axis_names": frozenset({"pipe"})}
        return {}

    def forward(self, input_ids: jax.Array,
                microbatches: Optional[int] = None) -> jax.Array:
        """input_ids [B, s] -> logits [B, s, vocab]. B must divide into
        microbatches (default: one per stage)."""
        cfg = self.cfg
        S = self.mesh.shape["pipe"]
        M = microbatches or S
        b, s = input_ids.shape
        if b % M:
            raise ValueError(f"batch {b} not divisible into {M} microbatches")
        mb = b // M

        positions = jnp.broadcast_to(jnp.arange(s), (mb, s))
        mask = causal_mask(s, s)
        rope = rope_tables_all(cfg, positions) if cfg.pos == "rope" else None
        backend = self.backend

        def stage_fn(staged_local, x_mb):
            # staged_local: [1, L/S, ...] this device's stage; x_mb replicated
            lp_stack = jax.tree_util.tree_map(lambda a: a[0], staged_local)
            idx = jax.lax.axis_index("pipe")

            def run_stage(x):
                def body(x, lp):
                    lp = dict(lp)
                    win = lp.pop("window", None)
                    sl = lp.pop("rope_local", None)
                    r = rope
                    if isinstance(rope, dict):  # gemma3 dual rope
                        r = jax.tree_util.tree_map(
                            lambda a, b: jnp.where(sl, a, b),
                            rope["local"], rope["global"])
                    y, _, _ = layer_forward(cfg, lp, x, mask, r,
                                            backend=backend, window=win)
                    return y, None
                y, _ = jax.lax.scan(body, x, lp_stack)
                return y

            perm = [(i, (i + 1) % S) for i in range(S)]

            def tick(t, carry):
                state, out_mb = carry
                # stage 0 feeds fresh microbatches; others consume the hop
                inp = jnp.where(idx == 0, x_mb[jnp.clip(t, 0, M - 1)], state)
                y = run_stage(inp)
                # the last stage completes microbatch t-(S-1) at tick t
                widx = jnp.clip(t - (S - 1), 0, M - 1)
                write = (idx == S - 1) & (t >= S - 1)
                out_mb = jax.lax.dynamic_update_index_in_dim(
                    out_mb, jnp.where(write, y, out_mb[widx]), widx, 0)
                state = jax.lax.ppermute(y, "pipe", perm)
                return state, out_mb

            # the carry is device-varying (each stage holds different data):
            # mark the zero inits as varying over "pipe" so the fori_loop
            # carry types line up under shard_map's vma typing
            state0 = jax.lax.pvary(jnp.zeros_like(x_mb[0]), "pipe")
            out0 = jax.lax.pvary(jnp.zeros_like(x_mb), "pipe")
            _, out_mb = jax.lax.fori_loop(0, M + S - 1, tick, (state0, out0))
            # results live on the last stage; masked psum broadcasts them
            return _bcast_psum(
                jnp.where(idx == S - 1, out_mb, jnp.zeros_like(out_mb)),
                "pipe")

        @partial(jax.jit, static_argnames=())
        def run(staged, outer, ids):
            pos_full = jnp.broadcast_to(jnp.arange(s), (b, s))
            x = embed(cfg, outer, ids, pos_full)
            x_mb = x.reshape(M, mb, s, x.shape[-1])
            y_mb = shard_map(stage_fn, mesh=self.mesh,
                             in_specs=(P("pipe"), P()),
                             out_specs=P(),
                             **self._shmap_kwargs)(staged, x_mb)
            y = y_mb.reshape(b, s, -1)
            return unembed(cfg, outer, y)

        with jax.set_mesh(self.mesh):
            return run(self.staged, self.outer, input_ids)


    def generate_greedy(self, input_ids: jax.Array, max_new_tokens: int,
                        microbatches: Optional[int] = None,
                        max_seq: Optional[int] = None) -> jax.Array:
        return self.generate(input_ids, max_new_tokens,
                             microbatches=microbatches, max_seq=max_seq)

    def generate(self, input_ids: jax.Array, max_new_tokens: int,
                 microbatches: Optional[int] = None,
                 max_seq: Optional[int] = None, temperature: float = 0.0,
                 top_k: int = 0, top_p: float = 1.0,
                 seed: int = 0) -> jax.Array:
        """Decode with resident per-stage KV caches; greedy (temperature 0)
        or sampled (temperature/top-k/top-p — the sample key is folded by
        tick index, so every production event draws an independent key on
        whichever stage produces it).

        input_ids [B, s] -> tokens [B, max_new_tokens]. B splits into M
        microbatches; decode ticks follow the fixed period-R schedule (see
        module docstring). Sliding-window / dual-rope / NoPE layers ride the
        staged pytree as data (window + rope_local leaves); ALiBi models
        work (bias computed inside layer_forward)."""
        cfg = self.cfg
        S = self.mesh.shape["pipe"]
        M = microbatches or S
        b, s = input_ids.shape
        N = max_new_tokens
        if b % M:
            raise ValueError(f"batch {b} not divisible into {M} microbatches")
        mb = b // M
        T = max_seq or min(cfg.max_position_embeddings, s + N)
        if s + N > T:
            raise ValueError(f"sequence {s + N} exceeds max_seq {T}")
        R = max(S, M)
        backend = self.backend
        outer = self.outer
        mesh = self.mesh

        def stage_fn(staged_local, outer_rep, x_mb):
            lp_stack = jax.tree_util.tree_map(lambda a: a[0], staged_local)
            per_local = jax.tree_util.tree_leaves(lp_stack)[0].shape[0]
            idx = jax.lax.axis_index("pipe")
            perm = [(i, (i + 1) % S) for i in range(S)]

            def run_stage(x, cache_m, pos, seqlen):
                """Scan this stage's layers; cache_m leaves [L/S, mb, T, ...]."""
                positions = pos + jnp.arange(seqlen)[None, :]
                rope = (rope_tables_all(cfg, jnp.broadcast_to(
                    positions, (x.shape[0], seqlen)))
                    if cfg.pos == "rope" else None)
                mask = (jnp.arange(T)[None, :] <= positions[0][:, None]
                        )[None, None]

                def body(x, lc_lp):
                    lc, lp = lc_lp
                    lp = dict(lp)
                    win = lp.pop("window", None)
                    sl = lp.pop("rope_local", None)
                    r = rope
                    if isinstance(rope, dict):  # dual rope rides the scan
                        r = jax.tree_util.tree_map(
                            lambda a_, b_: jnp.where(sl, a_, b_),
                            rope["local"], rope["global"])
                    y, new_lc, _ = layer_forward(cfg, lp, x, mask, r,
                                                 cache=lc, cache_pos=pos,
                                                 backend=backend, window=win)
                    return y, new_lc
                y, new_cache = jax.lax.scan(body, x, (cache_m, lp_stack))
                return y, new_cache

            def pick(logits, tick):
                if temperature <= 0.0:
                    return jnp.argmax(logits, axis=-1).astype(jnp.int32)
                from ..serve.engine import _sample
                key = jax.random.fold_in(jax.random.PRNGKey(seed), tick)
                return _sample(logits.astype(jnp.float32), key, temperature,
                               top_k, top_p)

            def init_caches():
                hkv, kd, vd = (cfg.kv_cache_heads, cfg.k_cache_dim,
                               cfg.v_cache_dim)
                z = {"k": jnp.zeros((per_local, M, mb, T, hkv, kd),
                                    jnp.bfloat16),
                     "v": jnp.zeros((per_local, M, mb, T, hkv, vd),
                                    jnp.bfloat16)}
                return jax.tree_util.tree_map(
                    lambda a: jax.lax.pvary(a, "pipe"), z)

            def sel_m(caches, m):
                return jax.tree_util.tree_map(
                    lambda a: jax.lax.dynamic_index_in_dim(a, m, 1, False),
                    caches)

            def put_m(caches, new, m, active):
                def upd(a, n):
                    cur = jax.lax.dynamic_index_in_dim(a, m, 1, False)
                    n = jnp.where(active, n.astype(a.dtype), cur)
                    return jax.lax.dynamic_update_index_in_dim(a, n, m, 1)
                return jax.tree_util.tree_map(upd, caches, new)

            # ---- phase 1: prefill (GPipe fill, writing caches) ----
            def pre_body(t, carry):
                caches, state, next_x, toks = carry
                m_in = jnp.clip(t, 0, M - 1)
                x = jnp.where(idx == 0, x_mb[m_in], state)
                m_here = jnp.clip(t - idx, 0, M - 1)
                active = (t - idx >= 0) & (t - idx < M)
                y, new_c = run_stage(x, sel_m(caches, m_here), 0, s)
                caches = put_m(caches, new_c, m_here, active)
                # last stage: greedy token 0 for microbatch t-(S-1)
                m_out = jnp.clip(t - (S - 1), 0, M - 1)
                produce = (idx == S - 1) & (t >= S - 1) & (t - (S - 1) < M)
                logits = unembed(cfg, outer_rep, y[:, -1:, :])[:, 0]
                tok = pick(logits, t)
                upd = embed(cfg, outer_rep, tok[:, None],
                            jnp.full((mb, 1), s, jnp.int32))
                nx_cur = jax.lax.dynamic_index_in_dim(next_x, m_out, 0, False)
                next_x = jax.lax.dynamic_update_index_in_dim(
                    next_x, jnp.where(produce, upd, nx_cur), m_out, 0)
                tcur = jax.lax.dynamic_index_in_dim(toks, m_out, 0, False)
                tcur = jnp.where((jnp.arange(N)[None, :] == 0) & produce,
                                 tok[:, None], tcur)
                toks = jax.lax.dynamic_update_index_in_dim(toks, tcur, m_out, 0)
                state = jax.lax.ppermute(y, "pipe", perm)
                # settle next_x onto every stage (stage 0 reads it next
                # phase); re-mark varying so the fori carry types line up
                next_x = jax.lax.pvary(_bcast_psum(
                    jnp.where(idx == S - 1, next_x,
                              jnp.zeros_like(next_x)), "pipe"), "pipe")
                return caches, state, next_x, toks

            caches = init_caches()
            H = x_mb.shape[-1]
            state0 = jax.lax.pvary(jnp.zeros((mb, s, H), x_mb.dtype), "pipe")
            next_x0 = jax.lax.pvary(jnp.zeros((M, mb, 1, H), x_mb.dtype),
                                    "pipe")
            toks0 = jax.lax.pvary(jnp.zeros((M, mb, N), jnp.int32), "pipe")

            caches, _, next_x, toks = jax.lax.fori_loop(
                0, M + S - 1, pre_body, (caches, state0, next_x0, toks0))

            # ---- phase 2: decode (period-R interleave) ----
            def dec_tick(t, carry):
                caches, state, next_x, toks = carry
                # stage `idx` serves microbatch m = (t - idx) mod R at step
                # k = (t - idx) // R; active iff m < M and k < N-1
                rel = t - idx
                m_here = jnp.clip(jnp.mod(rel, R), 0, M - 1)
                k_here = rel // R
                active = (rel >= 0) & (jnp.mod(rel, R) < M) & (k_here < N - 1)
                pos = s + k_here
                x_in = jax.lax.dynamic_index_in_dim(next_x, m_here, 0, False)
                x = jnp.where(idx == 0, x_in, state)
                y, new_c = run_stage(x, sel_m(caches, m_here),
                                     jnp.maximum(pos, 0), 1)
                caches = put_m(caches, new_c, m_here, active)
                # production on the last stage
                relp = t - (S - 1)
                m_out = jnp.clip(jnp.mod(relp, R), 0, M - 1)
                k_out = relp // R
                produce = ((idx == S - 1) & (relp >= 0)
                           & (jnp.mod(relp, R) < M) & (k_out < N - 1))
                logits = unembed(cfg, outer_rep, y)[:, 0]
                tok = pick(logits, (M + S - 1) + t)
                upd = embed(cfg, outer_rep, tok[:, None],
                            jnp.full((mb, 1), 0, jnp.int32) + s + k_out + 1)
                nx_cur = jax.lax.dynamic_index_in_dim(next_x, m_out, 0, False)
                next_x = jax.lax.dynamic_update_index_in_dim(
                    next_x, jnp.where(produce, upd, nx_cur), m_out, 0)
                tcur = jax.lax.dynamic_index_in_dim(toks, m_out, 0, False)
                slot = jnp.clip(k_out + 1, 0, N - 1)
                tcur = jnp.where(
                    (jnp.arange(N)[None, :] == slot) & produce,
                    tok[:, None], tcur)
                toks = jax.lax.dynamic_update_index_in_dim(toks, tcur, m_out, 0)
                state = jax.lax.ppermute(y, "pipe", perm)
                # tokens + next_x must reach stage 0: settle via masked psum
                next_x = jax.lax.pvary(_bcast_psum(
                    jnp.where(idx == S - 1, next_x,
                              jnp.zeros_like(next_x)), "pipe"), "pipe")
                return caches, state, next_x, toks

            state1 = jax.lax.pvary(
                jnp.zeros((mb, 1, H), x_mb.dtype), "pipe")
            n_ticks = (N - 1) * R + S - 1 if N > 1 else 0
            caches, _, next_x, toks = jax.lax.fori_loop(
                0, n_ticks, dec_tick, (caches, state1, next_x, toks))
            return jax.lax.psum(
                jnp.where(idx == S - 1, toks, jnp.zeros_like(toks)), "pipe")

        @jax.jit
        def run(staged, outer_rep, ids):
            pos_full = jnp.broadcast_to(jnp.arange(s), (b, s))
            x = embed(cfg, outer_rep, ids, pos_full)
            x_mb = x.reshape(M, mb, s, x.shape[-1])
            toks = shard_map(stage_fn, mesh=mesh,
                             in_specs=(P("pipe"), P(), P()),
                             out_specs=P(),
                             **self._shmap_kwargs)(staged, outer_rep, x_mb)
            return toks.reshape(b, N)

        with jax.set_mesh(mesh):
            return run(self.staged, self.outer, input_ids)


__all__ = ["PipelineRunner", "make_pipe_mesh", "stage_stack"]
