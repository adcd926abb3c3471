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

Prefill/forward only: token-by-token decode is latency-bound and a poor fit
for inter-stage hops; decode PP (with resident per-stage KV) is future work.
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


def make_pipe_mesh(stages: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if len(devices) < stages:
        raise ValueError(f"{stages} stages need {stages} devices, "
                         f"have {len(devices)}")
    return Mesh(np.asarray(devices[:stages]).reshape(stages), ("pipe",))


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
        staged = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, NamedSharding(mesh, P("pipe"))),
            staged)
        outer = {k: v for k, v in params.items() if k != "layers"}
        return cls(cfg, mesh, staged, outer, backend)

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
            return jax.lax.psum(
                jnp.where(idx == S - 1, out_mb, jnp.zeros_like(out_mb)),
                "pipe")

        @partial(jax.jit, static_argnames=())
        def run(staged, outer, ids):
            pos_full = jnp.broadcast_to(jnp.arange(s), (b, s))
            x = embed(cfg, outer, ids, pos_full)
            x_mb = x.reshape(M, mb, s, x.shape[-1])
            y_mb = shard_map(stage_fn, mesh=self.mesh,
                             in_specs=(P("pipe"), P()),
                             out_specs=P())(staged, x_mb)
            y = y_mb.reshape(b, s, -1)
            return unembed(cfg, outer, y)

        with jax.set_mesh(self.mesh):
            return run(self.staged, self.outer, input_ids)


__all__ = ["PipelineRunner", "make_pipe_mesh", "stage_stack"]
