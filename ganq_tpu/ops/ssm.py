"""Selective-state-space (Mamba S6) ops: the compute core of mamba-hybrid
architectures (Hymba, Jamba, Zamba).

The reference registers Hymba (gptqmodel/models/definitions/hymba.py) and
quantizes its ``mamba.in_proj`` / ``mamba.out_proj`` linears, delegating the
SSM math to the external ``mamba_ssm`` CUDA package. The TPU-native
equivalent lives here: the selective scan is a first-class ``lax.scan``
recurrence (XLA keeps the [B, D, N] state resident in VMEM across steps at
decode), the depthwise causal conv is an explicit K-tap shift-dot, and both
expose streaming state so prefill hands off to one-token decode exactly —
the same contract the attention KV cache follows.

Layer wiring (in_proj -> conv -> x_proj/dt_proj -> scan -> gate -> out_proj)
matches the mamba-1 block that ``mamba_ssm`` implements; in_proj/out_proj
are the quantization targets (the reference excludes x_proj/dt_proj too,
hymba.py layer_modules).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def selective_scan(x: jax.Array, dt: jax.Array, A_log: jax.Array,
                   Bc: jax.Array, Cc: jax.Array, D: jax.Array,
                   z: Optional[jax.Array] = None,
                   h0: Optional[jax.Array] = None
                   ) -> Tuple[jax.Array, jax.Array]:
    """Mamba S6 recurrence.

    x, dt: [B, T, Di] (dt already softplus'd); A_log: [Di, N] (A = -exp);
    Bc, Cc: [B, T, N] input-dependent state matrices; D: [Di] skip;
    z: optional [B, T, Di] SiLU gate; h0: optional initial state [B, Di, N].

    Returns (y [B, T, Di], h_T [B, Di, N]) — h_T feeds the next decode step.

        h_t = exp(dt_t * A) * h_{t-1} + dt_t * B_t * x_t
        y_t = C_t . h_t + D * x_t          (then y * silu(z))
    """
    B, T, Di = x.shape
    N = A_log.shape[1]
    f32 = jnp.float32
    A = -jnp.exp(A_log.astype(f32))                       # [Di, N]
    if h0 is None:
        h0 = jnp.zeros((B, Di, N), f32)

    def step(h, inp):
        x_t, dt_t, B_t, C_t = inp                          # [B,Di],[B,Di],[B,N],[B,N]
        dA = jnp.exp(dt_t[..., None] * A[None])            # [B, Di, N]
        h = h * dA + (dt_t * x_t)[..., None] * B_t[:, None, :]
        y = jnp.einsum("bdn,bn->bd", h, C_t)
        return h, y

    xs = (jnp.moveaxis(x.astype(f32), 1, 0),
          jnp.moveaxis(dt.astype(f32), 1, 0),
          jnp.moveaxis(Bc.astype(f32), 1, 0),
          jnp.moveaxis(Cc.astype(f32), 1, 0))
    hT, ys = jax.lax.scan(step, h0.astype(f32), xs)
    y = jnp.moveaxis(ys, 0, 1) + D.astype(f32)[None, None, :] * x.astype(f32)
    if z is not None:
        y = y * jax.nn.silu(z.astype(f32))
    return y.astype(x.dtype), hT


def causal_conv1d(x: jax.Array, conv_w: jax.Array,
                  conv_b: Optional[jax.Array] = None,
                  state: Optional[jax.Array] = None
                  ) -> Tuple[jax.Array, jax.Array]:
    """Depthwise causal conv: x [B, T, Di], conv_w [K, Di] (tap k multiplies
    x_{t-K+1+k}), optional bias [Di], optional carry-in ``state``
    [B, K-1, Di] (the last K-1 inputs of the previous segment).

    Returns (y [B, T, Di], new_state [B, K-1, Di]). Written as K shift-dots
    (K is 2-4) — no im2col buffers, XLA fuses the taps into one VPU pass."""
    B, T, Di = x.shape
    K = conv_w.shape[0]
    if state is None:
        state = jnp.zeros((B, K - 1, Di), x.dtype)
    ext = jnp.concatenate([state.astype(x.dtype), x], axis=1)  # [B, T+K-1, Di]
    y = jnp.zeros((B, T, Di), jnp.float32)
    for k in range(K):
        y = y + conv_w[k].astype(jnp.float32) * ext[:, k:k + T].astype(
            jnp.float32)
    if conv_b is not None:
        y = y + conv_b.astype(jnp.float32)
    return y.astype(x.dtype), ext[:, T:].astype(x.dtype)


def _lin(p, x):
    """Dense apply for plain {"weight"[, "bias"]} dicts or QLinear nodes
    (so in_proj/out_proj serve quantized through the standard kernels)."""
    from .qlinear import QLinear, apply as qapply

    if isinstance(p, QLinear):
        return qapply(p, x)
    y = x @ p["weight"].T.astype(x.dtype)
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(y.dtype)
    return y


def mamba_mix(mp: Dict[str, Any], x: jax.Array,
              state: Optional[Dict[str, jax.Array]] = None,
              want_taps: bool = False):
    """One mamba mixer: x [B, T, H] -> (y [B, T, H], new_state, taps).

    ``mp``: in_proj (H -> 2*Di), conv_w [K, Di] (+conv_b), x_proj
    (Di -> dt_rank + 2N), dt_proj (dt_rank -> Di, bias REQUIRED — it
    carries the dt initialization), A_log [Di, N], D [Di],
    out_proj (Di -> H). ``state``: {"conv" [B, K-1, Di], "ssm" [B, Di, N]}
    for streaming decode; None starts from zeros (prefill).

    Taps use the reference's module names (hymba.py layer_modules):
    mamba.in_proj / mamba.out_proj inputs."""
    taps: Dict[str, jax.Array] = {}
    if want_taps:
        taps["mamba.in_proj"] = x
    xz = _lin(mp["in_proj"], x)
    Di = xz.shape[-1] // 2
    xs, z = xz[..., :Di], xz[..., Di:]
    conv_state = None if state is None else state["conv"]
    xs, conv_state = causal_conv1d(xs, mp["conv_w"], mp.get("conv_b"),
                                   conv_state)
    xs = jax.nn.silu(xs.astype(jnp.float32)).astype(xz.dtype)
    dbc = _lin(mp["x_proj"], xs)
    N = mp["A_log"].shape[1]
    dt_rank = dbc.shape[-1] - 2 * N
    dt = jax.nn.softplus(_lin(mp["dt_proj"], dbc[..., :dt_rank])
                         .astype(jnp.float32))
    Bc = dbc[..., dt_rank:dt_rank + N]
    Cc = dbc[..., dt_rank + N:]
    h0 = None if state is None else state["ssm"]
    y, hT = selective_scan(xs, dt, mp["A_log"], Bc, Cc, mp["D"], z=z, h0=h0)
    if want_taps:
        taps["mamba.out_proj"] = y
    out = _lin(mp["out_proj"], y)
    return out, {"conv": conv_state, "ssm": hT}, taps


__all__ = ["selective_scan", "causal_conv1d", "mamba_mix"]
