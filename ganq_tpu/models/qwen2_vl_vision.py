"""Qwen2-VL vision tower + M-RoPE — native VL *serving* support.

The reference serves VL models through HF ``model.generate`` with the vision
tower in full precision (``gptqmodel/models/definitions/qwen2_vl.py``; only
the text decoder is quantized). This module is the TPU-native equivalent:

- :func:`vision_forward` — the Qwen2-VL ViT (patch embed, 2-D rotary,
  ``depth`` full-attention blocks over per-frame segments, 2x2 patch
  merger) as a pure JAX function over an fp params pytree
  (oracle: ``transformers`` ``Qwen2VisionTransformerPretrainedModel``).
- :func:`get_rope_index` — the 3-D (temporal/height/width) multimodal
  position assignment for the text decoder, host-side numpy (oracle:
  ``Qwen2VLModel.get_rope_index``).
- :func:`mrope_tables` — cos/sin rope tables with the channel dimension
  split into mrope sections (temporal/height/width interleave); the output
  plugs into the standard ``transformer.apply_rope`` unchanged, so the text
  decoder needs no modification. For text-only spans all three position
  streams are equal and mrope collapses to plain rope — which is why
  text-only serving never needed this module.

Videos ride the same machinery as images (a [t, h, w] grid per entry).
The vision tower is never quantized (matching the reference), so its params
stay plain ``{"weight","bias"}`` dicts.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .transformer import ModelConfig


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    """Qwen2-VL vision tower shape (HF ``Qwen2VLVisionConfig``)."""
    depth: int = 32
    embed_dim: int = 1280
    hidden_size: int = 3584          # output dim (= text hidden_size)
    num_heads: int = 16
    mlp_ratio: float = 4.0
    in_channels: int = 3
    patch_size: int = 14
    spatial_merge_size: int = 2
    temporal_patch_size: int = 2
    hidden_act: str = "quick_gelu"

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def patch_dim(self) -> int:
        return (self.in_channels * self.temporal_patch_size
                * self.patch_size * self.patch_size)


@dataclasses.dataclass(frozen=True)
class VLTokens:
    """Special-token wiring for multimodal inputs (HF ``Qwen2VLConfig``)."""
    image_token_id: int = 151655
    video_token_id: int = 151656
    vision_start_token_id: int = 151652
    mrope_section: Tuple[int, int, int] = (16, 24, 24)


def vision_config_from_hf(hf: Dict[str, Any]) -> Tuple[VisionConfig, VLTokens]:
    """Build (VisionConfig, VLTokens) from a full HF config dict."""
    vc = hf.get("vision_config") or {}
    vcfg = VisionConfig(
        depth=vc.get("depth", 32),
        embed_dim=vc.get("embed_dim", 1280),
        hidden_size=vc.get("hidden_size", hf.get("hidden_size", 3584)),
        num_heads=vc.get("num_heads", 16),
        mlp_ratio=vc.get("mlp_ratio", 4.0),
        in_channels=vc.get("in_channels", vc.get("in_chans", 3)),
        patch_size=vc.get("patch_size", 14),
        spatial_merge_size=vc.get("spatial_merge_size", 2),
        temporal_patch_size=vc.get("temporal_patch_size", 2),
        hidden_act=vc.get("hidden_act", "quick_gelu"),
    )
    tc = hf.get("text_config") or hf
    rs = tc.get("rope_scaling") or hf.get("rope_scaling") or {}
    sect = rs.get("mrope_section")
    if sect is None:
        # default: even thirds of the half-dim (matches qwen2-vl checkpoints
        # where head_dim=128 -> [16, 24, 24] is stored explicitly; a missing
        # section only occurs in synthetic configs)
        heads = tc.get("num_attention_heads", hf.get("num_attention_heads"))
        hd = tc.get("head_dim") or tc.get("hidden_size", hf.get("hidden_size")) // heads
        third = (hd // 2) // 3
        sect = [hd // 2 - 2 * third, third, third]
    toks = VLTokens(
        image_token_id=hf.get("image_token_id", 151655),
        video_token_id=hf.get("video_token_id", 151656),
        vision_start_token_id=hf.get("vision_start_token_id", 151652),
        mrope_section=tuple(int(x) for x in sect),
    )
    return vcfg, toks


# ------------------------------------------------------------- params import
VISION_PREFIXES = ("visual.", "model.visual.")


def import_vision_params(state: Dict[str, np.ndarray], vcfg: VisionConfig,
                         dtype=jnp.float32) -> Dict[str, Any]:
    """``visual.*`` HF state-dict keys -> vision params pytree.

    The Conv3d patch embedding (kernel == stride, bias-free) is stored as its
    matmul-equivalent [embed_dim, in_ch*tps*ps*ps] matrix — the processor
    already emits patches flattened in exactly that element order.
    """
    pfx = None
    for p in VISION_PREFIXES:
        if any(k.startswith(p) for k in state):
            pfx = p
            break
    if pfx is None:
        raise KeyError("no visual.* keys found in state dict")

    def get(name):
        return jnp.asarray(np.asarray(state[pfx + name]), dtype=dtype)

    def linear(name):
        d = {"weight": get(f"{name}.weight")}
        if pfx + name + ".bias" in state:
            d["bias"] = get(f"{name}.bias")
        return d

    params: Dict[str, Any] = {
        "patch_embed": {"weight": get("patch_embed.proj.weight").reshape(
            vcfg.embed_dim, vcfg.patch_dim)},
        "blocks": [],
        "merger": {
            "ln_q": {"weight": get("merger.ln_q.weight"),
                     "bias": get("merger.ln_q.bias")},
            "fc1": linear("merger.mlp.0"),
            "fc2": linear("merger.mlp.2"),
        },
    }
    for i in range(vcfg.depth):
        params["blocks"].append({
            "norm1": {"weight": get(f"blocks.{i}.norm1.weight"),
                      "bias": get(f"blocks.{i}.norm1.bias")},
            "norm2": {"weight": get(f"blocks.{i}.norm2.weight"),
                      "bias": get(f"blocks.{i}.norm2.bias")},
            "qkv": linear(f"blocks.{i}.attn.qkv"),
            "proj": linear(f"blocks.{i}.attn.proj"),
            "fc1": linear(f"blocks.{i}.mlp.fc1"),
            "fc2": linear(f"blocks.{i}.mlp.fc2"),
        })
    return params


def extract_vision_state(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """The raw ``visual.*`` subset (for checkpoint passthrough)."""
    return {k: np.asarray(v) for k, v in state.items()
            if k.startswith(VISION_PREFIXES)}


# ------------------------------------------------------- host-side positions
def vision_rot_pos_ids(grid_thw: np.ndarray, merge: int) -> np.ndarray:
    """Per-patch (h, w) rotary position ids in the processor's merge-group
    patch order (oracle: Qwen2VisionTransformer.rot_pos_emb)."""
    out: List[np.ndarray] = []
    for t, h, w in np.asarray(grid_thw):
        hpos = np.broadcast_to(np.arange(h)[:, None], (h, w))
        hpos = hpos.reshape(h // merge, merge, w // merge, merge)
        hpos = hpos.transpose(0, 2, 1, 3).reshape(-1)
        wpos = np.broadcast_to(np.arange(w)[None, :], (h, w))
        wpos = wpos.reshape(h // merge, merge, w // merge, merge)
        wpos = wpos.transpose(0, 2, 1, 3).reshape(-1)
        out.append(np.tile(np.stack([hpos, wpos], axis=-1), (t, 1)))
    return np.concatenate(out, axis=0)                       # [S, 2]


def _vision_rope_tables(vcfg: VisionConfig,
                        grid_thw: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """cos/sin [S, head_dim] for the 2-D vision rope (f32)."""
    dim = vcfg.head_dim // 2                    # half rotates by h, half by w
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    pos = vision_rot_pos_ids(grid_thw, vcfg.spatial_merge_size)  # [S, 2]
    freqs = pos[:, :, None].astype(np.float64) * inv_freq        # [S, 2, dim/2]
    half = freqs.reshape(freqs.shape[0], -1)                     # [S, dim]
    emb = np.concatenate([half, half], axis=-1)                  # [S, head_dim]
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


def _vision_segments(grid_thw: np.ndarray) -> np.ndarray:
    """Attention segment id per patch: every temporal frame of every image is
    its own full-attention block (HF cu_seqlens construction)."""
    sizes = np.repeat(np.asarray(grid_thw)[:, 1] * np.asarray(grid_thw)[:, 2],
                      np.asarray(grid_thw)[:, 0])
    return np.repeat(np.arange(len(sizes)), sizes)


# ------------------------------------------------------------ vision forward
def _ln(x: jax.Array, p: Dict[str, jax.Array], eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["weight"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _lin(x: jax.Array, p: Dict[str, jax.Array]) -> jax.Array:
    y = x @ p["weight"].T.astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def _vact(x: jax.Array, kind: str) -> jax.Array:
    if kind == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    if kind in ("gelu_tanh", "gelu_new", "gelu_pytorch_tanh"):
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def vision_forward(vcfg: VisionConfig, params: Dict[str, Any],
                   patches: jax.Array, grid_thw: np.ndarray) -> jax.Array:
    """Vision tower: flattened patches [S, C*tps*ps*ps] -> merged image-token
    embeddings [S / merge^2, hidden_size].

    ``grid_thw`` [n, 3] is HOST data (shapes/segment structure must be static
    under jit). Attention is full within each temporal frame, block-diagonal
    across frames/images — expressed as one masked attention over S (the
    merge-group patch ordering is position-encoded, so one dense S x S
    attention with a segment mask is exact).
    """
    grid_thw = np.asarray(grid_thw)
    x = patches @ params["patch_embed"]["weight"].T.astype(patches.dtype)
    cos, sin = _vision_rope_tables(vcfg, grid_thw)
    cos = jnp.asarray(cos)[:, None, :]          # [S, 1, head_dim]
    sin = jnp.asarray(sin)[:, None, :]
    seg = _vision_segments(grid_thw)
    mask = jnp.asarray(seg[:, None] == seg[None, :])[None, None]  # [1,1,S,S]
    S = x.shape[0]
    H, d = vcfg.num_heads, vcfg.head_dim
    scale = 1.0 / math.sqrt(d)

    for blk in params["blocks"]:
        h = _ln(x, blk["norm1"])
        qkv = _lin(h, blk["qkv"]).reshape(S, 3, H, d)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]       # [S, H, d]
        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        q = (qf * cos + _rotate_half(qf) * sin).astype(x.dtype)
        k = (kf * cos + _rotate_half(kf) * sin).astype(x.dtype)
        logits = jnp.einsum("shd,thd->hst", q, k).astype(jnp.float32) * scale
        logits = jnp.where(mask[0], logits, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        attn = jnp.einsum("hst,thd->shd", probs, v).reshape(S, H * d)
        x = x + _lin(attn, blk["proj"])
        h = _ln(x, blk["norm2"])
        x = x + _lin(_vact(_lin(h, blk["fc1"]), vcfg.hidden_act), blk["fc2"])

    m = vcfg.spatial_merge_size
    y = _ln(x, params["merger"]["ln_q"]).reshape(-1, vcfg.embed_dim * m * m)
    y = _lin(y, params["merger"]["fc1"])
    y = _lin(jax.nn.gelu(y, approximate=False), params["merger"]["fc2"])
    return y


# ----------------------------------------------------------- mrope positions
def get_rope_index(
    input_ids: np.ndarray,
    image_grid_thw: Optional[np.ndarray],
    video_grid_thw: Optional[np.ndarray],
    toks: VLTokens,
    spatial_merge_size: int,
    attention_mask: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """3-D rope position ids for the text decoder (host numpy; oracle:
    ``Qwen2VLModel.get_rope_index``).

    Returns (position_ids [3, b, s], mrope_position_deltas [b, 1]) — text
    spans advance all three streams together; each vision span gets
    (temporal, row, column) grid positions starting at the span's base, and
    the following text resumes at max(vision span) + 1. ``deltas`` is what a
    decode step adds to its cache position to get its rope position.
    """
    input_ids = np.asarray(input_ids)
    b, s = input_ids.shape
    if image_grid_thw is None and video_grid_thw is None:
        if attention_mask is not None:
            am = np.asarray(attention_mask)
            pos = np.cumsum(am, axis=-1) - 1
            pos[am == 0] = 1
            pos3 = np.broadcast_to(pos[None], (3, b, s)).copy()
            deltas = (pos.max(axis=-1, keepdims=True) + 1 - s)
            return pos3, deltas
        pos3 = np.broadcast_to(np.arange(s)[None, None], (3, b, s)).copy()
        return pos3, np.zeros((b, 1), np.int64)

    position_ids = np.ones((3, b, s), np.int64)
    deltas = np.zeros((b, 1), np.int64)
    img_i = vid_i = 0
    for r in range(b):
        row = input_ids[r]
        keep = (np.asarray(attention_mask)[r] == 1 if attention_mask is not None
                else np.ones(s, bool))
        ids = row[keep]
        tokens = ids.tolist()
        pieces: List[np.ndarray] = []
        st = 0
        starts = np.where(ids == toks.vision_start_token_id)[0]
        vis = ids[starts + 1] if len(starts) else np.asarray([], ids.dtype)
        n_img = int(np.sum(vis == toks.image_token_id))
        n_vid = int(np.sum(vis == toks.video_token_id))
        for _ in range(n_img + n_vid):
            ed_img = (tokens.index(toks.image_token_id, st)
                      if n_img > 0 and toks.image_token_id in tokens[st:]
                      else len(tokens) + 1)
            ed_vid = (tokens.index(toks.video_token_id, st)
                      if n_vid > 0 and toks.video_token_id in tokens[st:]
                      else len(tokens) + 1)
            if ed_img < ed_vid:
                t, h, w = np.asarray(image_grid_thw)[img_i]
                img_i += 1
                n_img -= 1
                ed = ed_img
            else:
                t, h, w = np.asarray(video_grid_thw)[vid_i]
                vid_i += 1
                n_vid -= 1
                ed = ed_vid
            gt, gh, gw = int(t), int(h) // spatial_merge_size, int(w) // spatial_merge_size
            text_len = ed - st
            base = pieces[-1].max() + 1 if pieces else 0
            pieces.append(np.broadcast_to(np.arange(text_len)[None], (3, text_len))
                          + base)
            ti = np.repeat(np.arange(gt), gh * gw)
            hi = np.tile(np.repeat(np.arange(gh), gw), gt)
            wi = np.tile(np.arange(gw), gt * gh)
            pieces.append(np.stack([ti, hi, wi]) + text_len + base)
            st = ed + gt * gh * gw
        if st < len(tokens):
            base = pieces[-1].max() + 1 if pieces else 0
            text_len = len(tokens) - st
            pieces.append(np.broadcast_to(np.arange(text_len)[None], (3, text_len))
                          + base)
        llm = np.concatenate(pieces, axis=1)
        position_ids[:, r, keep] = llm
        deltas[r, 0] = llm.max() + 1 - s
    return position_ids, deltas


def mrope_tables(cfg: ModelConfig, position_ids: jax.Array,
                 mrope_section: Sequence[int]) -> Tuple[jax.Array, jax.Array]:
    """cos/sin rope tables [b, s, rd] from 3-D positions [3, b, s] with the
    frequency channels split into (temporal, height, width) sections
    (oracle: ``apply_multimodal_rotary_pos_emb``'s section interleave; the
    result feeds the standard ``transformer.apply_rope``)."""
    rd = cfg.rotary_dim or cfg.head_dim
    inv_freq = 1.0 / (cfg.rope_theta
                      ** (jnp.arange(0, rd, 2, dtype=jnp.float32) / rd))
    freqs = (jnp.asarray(position_ids)[..., None].astype(jnp.float32)
             * inv_freq)                                    # [3, b, s, rd/2]
    chunks = []
    off = 0
    for i, width in enumerate(mrope_section):
        chunks.append(freqs[i % 3, :, :, off:off + width])
        off += width
    half = jnp.concatenate(chunks, axis=-1)                 # [b, s, rd/2]
    emb = jnp.concatenate([half, half], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


__all__ = ["VisionConfig", "VLTokens", "vision_config_from_hf",
           "import_vision_params", "extract_vision_state", "vision_forward",
           "get_rope_index", "mrope_tables", "vision_rot_pos_ids"]
