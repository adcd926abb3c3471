"""Architecture registry: HF config -> ModelConfig + parameter name maps.

The declarative counterpart of the reference's ``MODEL_MAP`` + per-arch
definition classes (``gptqmodel/models/auto.py:120-176``,
``models/definitions/*.py``). Each entry describes:

- how to build :class:`ModelConfig` from a HF ``config.json``;
- the HF state-dict name template for every param slot;
- ``layer_modules``: ordered quantization subsets (true_sequential order),
  using reference-convention module names so dynamic-override regexes match;
- ``base_modules`` / ``lm_head`` names for checkpoint IO.

Llama-family derivatives (mistral, qwen2, ...) reuse the llama spec with
knob tweaks — the TPU analog of the reference's subclassing-by-declaration.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace as dataclasses_replace
from typing import Any, Callable, Dict, List, Optional

from .transformer import ModelConfig


@dataclass
class ArchSpec:
    model_type: str
    make_config: Callable[[Dict[str, Any]], ModelConfig]
    # optional state-dict preprocessor (e.g. gpt2 Conv1D transpose + c_attn
    # split) applied before name mapping
    convert_state: Optional[Callable[[Dict[str, Any], Dict[str, Any]],
                                     Dict[str, Any]]] = None
    # state-dict templates; {i} = layer index
    name_map: Dict[str, str] = field(default_factory=dict)
    # quantization subsets in true_sequential order (reference layer_modules)
    layer_modules: List[List[str]] = field(default_factory=list)
    # tap key -> param path ("attn.q", "mlp.down", ...)
    module_slots: Dict[str, str] = field(default_factory=dict)
    lm_head_name: str = "lm_head"
    layers_prefix: str = "model.layers"
    # wrapper/composite architectures (ovis: an LLM + a visual tokenizer)
    # whose inner decoder type is only known from the config: called with the
    # HF config dict at import/save/load time, returns the concrete spec
    # (inner arch's name_map/make_config with the wrapper's model_type)
    resolve: Optional[Callable[[Dict[str, Any]], "ArchSpec"]] = None

    def expand(self, num_experts: int) -> "ArchSpec":
        """Instantiate {e} expert templates (the reference's
        get_moe_layer_modules / EXPERT_INDEX_PLACEHOLDER expansion,
        utils/model.py:938-950)."""
        if num_experts <= 0 or not any("{e}" in m for sub in self.layer_modules
                                       for m in sub):
            return self
        import dataclasses as _dc
        name_map = {}
        for ours, theirs in self.name_map.items():
            if "{e}" in ours:
                for e in range(num_experts):
                    name_map[ours.replace("{e}", str(e))] =                         theirs.replace("{e}", str(e))
            else:
                name_map[ours] = theirs
        layer_modules = []
        for sub in self.layer_modules:
            exp_sub = []
            for m in sub:
                if "{e}" in m:
                    exp_sub.extend(m.replace("{e}", str(e))
                                   for e in range(num_experts))
                else:
                    exp_sub.append(m)
            layer_modules.append(exp_sub)
        module_slots = {}
        for m, slot in self.module_slots.items():
            if "{e}" in m:
                for e in range(num_experts):
                    module_slots[m.replace("{e}", str(e))] =                         slot.replace("{e}", str(e))
            else:
                module_slots[m] = slot
        return _dc.replace(self, name_map=name_map,
                           layer_modules=layer_modules,
                           module_slots=module_slots)


REGISTRY: Dict[str, ArchSpec] = {}


def register(spec: ArchSpec) -> ArchSpec:
    REGISTRY[spec.model_type] = spec
    return spec


def get_spec(model_type: str) -> ArchSpec:
    if model_type not in REGISTRY:
        raise KeyError(
            f"Unsupported architecture '{model_type}'. Registered: {sorted(REGISTRY)}")
    return REGISTRY[model_type]


def resolve_spec(spec: ArchSpec, hf_config: Dict[str, Any]) -> ArchSpec:
    """Apply a wrapper spec's config-driven resolution (no-op otherwise)."""
    return spec.resolve(hf_config) if spec.resolve is not None else spec


# ---------------------------------------------------------------------- llama
def _llama_config(hf: Dict[str, Any]) -> ModelConfig:
    heads = hf["num_attention_heads"]
    return ModelConfig(
        model_type=hf.get("model_type", "llama"),
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=heads,
        num_key_value_heads=hf.get("num_key_value_heads", heads),
        head_dim=hf.get("head_dim") or hf["hidden_size"] // heads,
        max_position_embeddings=hf.get("max_position_embeddings", 2048),
        norm="rmsnorm",
        norm_eps=hf.get("rms_norm_eps", 1e-5),
        act=hf.get("hidden_act", "silu"),
        gated_mlp=True,
        pos="rope",
        rope_theta=hf.get("rope_theta", 10000.0),
        rope_scaling=hf.get("rope_scaling"),
        attn_bias=hf.get("attention_bias", False),
        mlp_bias=hf.get("mlp_bias", False),
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
    )


LLAMA_NAME_MAP = {
    "embed_tokens.weight": "model.embed_tokens.weight",
    "final_norm.weight": "model.norm.weight",
    "lm_head.weight": "lm_head.weight",
    "layers.{i}.input_norm.weight": "model.layers.{i}.input_layernorm.weight",
    "layers.{i}.post_norm.weight": "model.layers.{i}.post_attention_layernorm.weight",
    "layers.{i}.attn.q.weight": "model.layers.{i}.self_attn.q_proj.weight",
    "layers.{i}.attn.k.weight": "model.layers.{i}.self_attn.k_proj.weight",
    "layers.{i}.attn.v.weight": "model.layers.{i}.self_attn.v_proj.weight",
    "layers.{i}.attn.o.weight": "model.layers.{i}.self_attn.o_proj.weight",
    "layers.{i}.attn.q.bias": "model.layers.{i}.self_attn.q_proj.bias",
    "layers.{i}.attn.k.bias": "model.layers.{i}.self_attn.k_proj.bias",
    "layers.{i}.attn.v.bias": "model.layers.{i}.self_attn.v_proj.bias",
    "layers.{i}.mlp.gate.weight": "model.layers.{i}.mlp.gate_proj.weight",
    "layers.{i}.mlp.up.weight": "model.layers.{i}.mlp.up_proj.weight",
    "layers.{i}.mlp.down.weight": "model.layers.{i}.mlp.down_proj.weight",
}

LLAMA_LAYER_MODULES = [
    ["self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"],
    ["self_attn.o_proj"],
    ["mlp.up_proj", "mlp.gate_proj"],
    ["mlp.down_proj"],
]

LLAMA_SLOTS = {
    "self_attn.q_proj": "attn.q",
    "self_attn.k_proj": "attn.k",
    "self_attn.v_proj": "attn.v",
    "self_attn.o_proj": "attn.o",
    "mlp.gate_proj": "mlp.gate",
    "mlp.up_proj": "mlp.up",
    "mlp.down_proj": "mlp.down",
}

register(ArchSpec(
    model_type="llama",
    make_config=_llama_config,
    name_map=LLAMA_NAME_MAP,
    layer_modules=LLAMA_LAYER_MODULES,
    module_slots=LLAMA_SLOTS,
))

# llama-family derivatives sharing the spec verbatim — only architectures
# whose module structure and tensor names truly match llama's (qkv biases are
# picked up by presence). Lookalikes with extra machinery get their own specs
# below (qwen3 q/k norms, olmo2 post-norms, stablelm partial rope); those
# with still-unmodeled machinery (granite multipliers, deci variable GQA,
# remote-code arches) are intentionally NOT aliased: wrong silently is worse
# than unsupported loudly.
for _mt in ("mistral", "qwen2", "yi", "mobilellm"):
    register(ArchSpec(
        model_type=_mt,
        make_config=_llama_config,
        name_map=LLAMA_NAME_MAP,
        layer_modules=LLAMA_LAYER_MODULES,
        module_slots=LLAMA_SLOTS,
    ))


# ------------------------------------------------------------------------ opt
def _opt_config(hf: Dict[str, Any]) -> ModelConfig:
    heads = hf["num_attention_heads"]
    hidden = hf["hidden_size"]
    wpd = hf.get("word_embed_proj_dim", hidden)
    return ModelConfig(
        model_type="opt",
        vocab_size=hf["vocab_size"],
        hidden_size=hidden,
        intermediate_size=hf["ffn_dim"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=heads,
        num_key_value_heads=heads,
        head_dim=hidden // heads,
        max_position_embeddings=hf.get("max_position_embeddings", 2048),
        norm="layernorm",
        norm_eps=1e-5,
        act=hf.get("activation_function", "relu"),
        gated_mlp=False,
        pos="learned",
        pos_offset=2,
        attn_bias=hf.get("enable_bias", True),
        mlp_bias=hf.get("enable_bias", True),
        tie_word_embeddings=hf.get("tie_word_embeddings", True),
        do_layer_norm_before=hf.get("do_layer_norm_before", True),
        word_embed_proj_dim=wpd if wpd != hidden else None,
        final_layer_norm=hf.get("do_layer_norm_before", True)
                         and not hf.get("_remove_final_layer_norm", False),
    )


OPT_NAME_MAP = {
    "embed_tokens.weight": "model.decoder.embed_tokens.weight",
    "embed_positions.weight": "model.decoder.embed_positions.weight",
    "final_norm.weight": "model.decoder.final_layer_norm.weight",
    "final_norm.bias": "model.decoder.final_layer_norm.bias",
    "project_in.weight": "model.decoder.project_in.weight",
    "project_out.weight": "model.decoder.project_out.weight",
    "lm_head.weight": "lm_head.weight",
    "layers.{i}.input_norm.weight": "model.decoder.layers.{i}.self_attn_layer_norm.weight",
    "layers.{i}.input_norm.bias": "model.decoder.layers.{i}.self_attn_layer_norm.bias",
    "layers.{i}.post_norm.weight": "model.decoder.layers.{i}.final_layer_norm.weight",
    "layers.{i}.post_norm.bias": "model.decoder.layers.{i}.final_layer_norm.bias",
    "layers.{i}.attn.q.weight": "model.decoder.layers.{i}.self_attn.q_proj.weight",
    "layers.{i}.attn.k.weight": "model.decoder.layers.{i}.self_attn.k_proj.weight",
    "layers.{i}.attn.v.weight": "model.decoder.layers.{i}.self_attn.v_proj.weight",
    "layers.{i}.attn.o.weight": "model.decoder.layers.{i}.self_attn.out_proj.weight",
    "layers.{i}.attn.q.bias": "model.decoder.layers.{i}.self_attn.q_proj.bias",
    "layers.{i}.attn.k.bias": "model.decoder.layers.{i}.self_attn.k_proj.bias",
    "layers.{i}.attn.v.bias": "model.decoder.layers.{i}.self_attn.v_proj.bias",
    "layers.{i}.attn.o.bias": "model.decoder.layers.{i}.self_attn.out_proj.bias",
    "layers.{i}.mlp.up.weight": "model.decoder.layers.{i}.fc1.weight",
    "layers.{i}.mlp.up.bias": "model.decoder.layers.{i}.fc1.bias",
    "layers.{i}.mlp.down.weight": "model.decoder.layers.{i}.fc2.weight",
    "layers.{i}.mlp.down.bias": "model.decoder.layers.{i}.fc2.bias",
}

# reference OPT ordering (definitions/opt.py)
OPT_LAYER_MODULES = [
    ["self_attn.k_proj", "self_attn.v_proj", "self_attn.q_proj"],
    ["self_attn.out_proj"],
    ["fc1"],
    ["fc2"],
]

OPT_SLOTS = {
    "self_attn.q_proj": "attn.q",
    "self_attn.k_proj": "attn.k",
    "self_attn.v_proj": "attn.v",
    "self_attn.out_proj": "attn.o",
    "fc1": "mlp.up",
    "fc2": "mlp.down",
}

register(ArchSpec(
    model_type="opt",
    make_config=_opt_config,
    name_map=OPT_NAME_MAP,
    layer_modules=OPT_LAYER_MODULES,
    module_slots=OPT_SLOTS,
    layers_prefix="model.decoder.layers",
))


__all__ = ["ArchSpec", "REGISTRY", "register", "get_spec"]


# ---------------------------------------------------------------------- gemma
def _gemma_config(hf: Dict[str, Any]) -> ModelConfig:
    base = _llama_config(hf)
    import dataclasses as _dc
    return _dc.replace(
        base,
        model_type="gemma",
        head_dim=hf.get("head_dim", 256),
        rms_offset=1.0,                       # weight stored as (w - 1)
        embed_scale=hf["hidden_size"] ** 0.5,  # normalizer baked into embed
        act=hf.get("hidden_activation") or hf.get("hidden_act", "gelu_pytorch_tanh"),
        tie_word_embeddings=True,
    )


register(ArchSpec(
    model_type="gemma",
    make_config=_gemma_config,
    name_map=LLAMA_NAME_MAP,
    layer_modules=LLAMA_LAYER_MODULES,
    module_slots=LLAMA_SLOTS,
))


# ----------------------------------------------------------------------- gpt2
def _gpt2_config(hf: Dict[str, Any]) -> ModelConfig:
    h = hf["n_embd"]
    heads = hf["n_head"]
    return ModelConfig(
        model_type="gpt2",
        vocab_size=hf["vocab_size"],
        hidden_size=h,
        intermediate_size=hf.get("n_inner") or 4 * h,
        num_hidden_layers=hf["n_layer"],
        num_attention_heads=heads,
        num_key_value_heads=heads,
        head_dim=h // heads,
        max_position_embeddings=hf.get("n_positions", 1024),
        norm="layernorm",
        norm_eps=hf.get("layer_norm_epsilon", 1e-5),
        act=hf.get("activation_function", "gelu_new"),
        gated_mlp=False,
        pos="learned",
        pos_offset=0,
        attn_bias=True,
        mlp_bias=True,
        tie_word_embeddings=True,
    )


def _gpt2_convert_state(state: Dict[str, Any], hf: Dict[str, Any]) -> Dict[str, Any]:
    """Transpose Conv1D weights ([in, out] storage) and split the fused
    c_attn into q/k/v — normalizing to per-projection tensors."""
    import numpy as _np

    h = hf["n_embd"]
    out: Dict[str, Any] = {}
    for k, v in state.items():
        v = _np.asarray(v)
        if k.endswith("attn.c_attn.weight"):
            w = v.T  # [3h, h]
            base = k[: -len("c_attn.weight")]
            out[base + "q_proj.weight"] = _np.ascontiguousarray(w[:h])
            out[base + "k_proj.weight"] = _np.ascontiguousarray(w[h:2 * h])
            out[base + "v_proj.weight"] = _np.ascontiguousarray(w[2 * h:])
        elif k.endswith("attn.c_attn.bias"):
            base = k[: -len("c_attn.bias")]
            out[base + "q_proj.bias"] = _np.ascontiguousarray(v[:h])
            out[base + "k_proj.bias"] = _np.ascontiguousarray(v[h:2 * h])
            out[base + "v_proj.bias"] = _np.ascontiguousarray(v[2 * h:])
        elif k.endswith((".c_proj.weight", ".c_fc.weight")):
            out[k] = _np.ascontiguousarray(v.T)
        else:
            out[k] = v
    return out


GPT2_NAME_MAP = {
    "embed_tokens.weight": "transformer.wte.weight",
    "embed_positions.weight": "transformer.wpe.weight",
    "final_norm.weight": "transformer.ln_f.weight",
    "final_norm.bias": "transformer.ln_f.bias",
    "lm_head.weight": "lm_head.weight",
    "layers.{i}.input_norm.weight": "transformer.h.{i}.ln_1.weight",
    "layers.{i}.input_norm.bias": "transformer.h.{i}.ln_1.bias",
    "layers.{i}.post_norm.weight": "transformer.h.{i}.ln_2.weight",
    "layers.{i}.post_norm.bias": "transformer.h.{i}.ln_2.bias",
    "layers.{i}.attn.q.weight": "transformer.h.{i}.attn.q_proj.weight",
    "layers.{i}.attn.k.weight": "transformer.h.{i}.attn.k_proj.weight",
    "layers.{i}.attn.v.weight": "transformer.h.{i}.attn.v_proj.weight",
    "layers.{i}.attn.o.weight": "transformer.h.{i}.attn.c_proj.weight",
    "layers.{i}.attn.q.bias": "transformer.h.{i}.attn.q_proj.bias",
    "layers.{i}.attn.k.bias": "transformer.h.{i}.attn.k_proj.bias",
    "layers.{i}.attn.v.bias": "transformer.h.{i}.attn.v_proj.bias",
    "layers.{i}.attn.o.bias": "transformer.h.{i}.attn.c_proj.bias",
    "layers.{i}.mlp.up.weight": "transformer.h.{i}.mlp.c_fc.weight",
    "layers.{i}.mlp.up.bias": "transformer.h.{i}.mlp.c_fc.bias",
    "layers.{i}.mlp.down.weight": "transformer.h.{i}.mlp.c_proj.weight",
    "layers.{i}.mlp.down.bias": "transformer.h.{i}.mlp.c_proj.bias",
}

GPT2_LAYER_MODULES = [
    ["attn.q_proj", "attn.k_proj", "attn.v_proj"],
    ["attn.c_proj"],
    ["mlp.c_fc"],
    ["mlp.c_proj"],
]

GPT2_SLOTS = {
    "attn.q_proj": "attn.q",
    "attn.k_proj": "attn.k",
    "attn.v_proj": "attn.v",
    "attn.c_proj": "attn.o",
    "mlp.c_fc": "mlp.up",
    "mlp.c_proj": "mlp.down",
}

register(ArchSpec(
    model_type="gpt2",
    make_config=_gpt2_config,
    convert_state=_gpt2_convert_state,
    name_map=GPT2_NAME_MAP,
    layer_modules=GPT2_LAYER_MODULES,
    module_slots=GPT2_SLOTS,
    layers_prefix="transformer.h",
))


# -------------------------------------------------------------------- mixtral
def _mixtral_config(hf: Dict[str, Any]) -> ModelConfig:
    base = _llama_config(hf)
    import dataclasses as _dc
    return _dc.replace(
        base, model_type="mixtral",
        num_experts=hf.get("num_local_experts", 8),
        num_experts_per_tok=hf.get("num_experts_per_tok", 2))


MIXTRAL_NAME_MAP = {
    "embed_tokens.weight": "model.embed_tokens.weight",
    "final_norm.weight": "model.norm.weight",
    "lm_head.weight": "lm_head.weight",
    "layers.{i}.input_norm.weight": "model.layers.{i}.input_layernorm.weight",
    "layers.{i}.post_norm.weight": "model.layers.{i}.post_attention_layernorm.weight",
    "layers.{i}.attn.q.weight": "model.layers.{i}.self_attn.q_proj.weight",
    "layers.{i}.attn.k.weight": "model.layers.{i}.self_attn.k_proj.weight",
    "layers.{i}.attn.v.weight": "model.layers.{i}.self_attn.v_proj.weight",
    "layers.{i}.attn.o.weight": "model.layers.{i}.self_attn.o_proj.weight",
    "layers.{i}.moe.router.weight": "model.layers.{i}.block_sparse_moe.gate.weight",
    "layers.{i}.moe.experts.{e}.gate.weight":
        "model.layers.{i}.block_sparse_moe.experts.{e}.w1.weight",
    "layers.{i}.moe.experts.{e}.down.weight":
        "model.layers.{i}.block_sparse_moe.experts.{e}.w2.weight",
    "layers.{i}.moe.experts.{e}.up.weight":
        "model.layers.{i}.block_sparse_moe.experts.{e}.w3.weight",
}

# router stays dense (tiny, accuracy-critical) — reference mixtral.py quantizes
# only experts w1/w3/w2
MIXTRAL_LAYER_MODULES = [
    ["self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"],
    ["self_attn.o_proj"],
    ["block_sparse_moe.experts.{e}.w1", "block_sparse_moe.experts.{e}.w3"],
    ["block_sparse_moe.experts.{e}.w2"],
]

MIXTRAL_SLOTS = {
    "self_attn.q_proj": "attn.q",
    "self_attn.k_proj": "attn.k",
    "self_attn.v_proj": "attn.v",
    "self_attn.o_proj": "attn.o",
    "block_sparse_moe.experts.{e}.w1": "moe.experts.{e}.gate",
    "block_sparse_moe.experts.{e}.w3": "moe.experts.{e}.up",
    "block_sparse_moe.experts.{e}.w2": "moe.experts.{e}.down",
}

register(ArchSpec(
    model_type="mixtral",
    make_config=_mixtral_config,
    name_map=MIXTRAL_NAME_MAP,
    layer_modules=MIXTRAL_LAYER_MODULES,
    module_slots=MIXTRAL_SLOTS,
))


# ----------------------------------------------------------------------- phi3
def _phi3_config(hf: Dict[str, Any]) -> ModelConfig:
    base = _llama_config(hf)
    import dataclasses as _dc
    return _dc.replace(base, model_type="phi3")


def _phi3_convert_state(state: Dict[str, Any], hf: Dict[str, Any]) -> Dict[str, Any]:
    """Split phi3's fused qkv_proj ([q; k; v] rows) and gate_up_proj
    ([gate; up] rows) into per-projection tensors."""
    import numpy as _np

    heads = hf["num_attention_heads"]
    kv = hf.get("num_key_value_heads", heads)
    hd = hf.get("head_dim") or hf["hidden_size"] // heads
    qd, kvd = heads * hd, kv * hd
    inter = hf["intermediate_size"]
    out: Dict[str, Any] = {}
    for k, v in state.items():
        v = _np.asarray(v)
        if ".self_attn.qkv_proj." in k:
            base = k.replace("qkv_proj", "{}")
            suffix = k.rsplit(".", 1)[-1]  # weight|bias
            out[base.format("q_proj")] = _np.ascontiguousarray(v[:qd])
            out[base.format("k_proj")] = _np.ascontiguousarray(v[qd:qd + kvd])
            out[base.format("v_proj")] = _np.ascontiguousarray(v[qd + kvd:])
        elif ".mlp.gate_up_proj." in k:
            base = k.replace("gate_up_proj", "{}")
            out[base.format("gate_proj")] = _np.ascontiguousarray(v[:inter])
            out[base.format("up_proj")] = _np.ascontiguousarray(v[inter:])
        else:
            out[k] = v
    return out


register(ArchSpec(
    model_type="phi3",
    make_config=_phi3_config,
    convert_state=_phi3_convert_state,
    name_map=LLAMA_NAME_MAP,
    layer_modules=LLAMA_LAYER_MODULES,
    module_slots=LLAMA_SLOTS,
))


# ---------------------------------------------------------------------- qwen3
def _qwen3_config(hf: Dict[str, Any]) -> ModelConfig:
    base = _llama_config(hf)
    import dataclasses as _dc
    return _dc.replace(base, model_type="qwen3", qk_norm=True)


QWEN3_NAME_MAP = dict(LLAMA_NAME_MAP)
QWEN3_NAME_MAP.update({
    "layers.{i}.attn.q_norm.weight": "model.layers.{i}.self_attn.q_norm.weight",
    "layers.{i}.attn.k_norm.weight": "model.layers.{i}.self_attn.k_norm.weight",
})

register(ArchSpec(
    model_type="qwen3",
    make_config=_qwen3_config,
    name_map=QWEN3_NAME_MAP,
    layer_modules=LLAMA_LAYER_MODULES,
    module_slots=LLAMA_SLOTS,
))


# ---------------------------------------------------------------------- olmo2
def _olmo2_config(hf: Dict[str, Any]) -> ModelConfig:
    """OLMo2: llama-shaped weights, but norms are applied to each sublayer's
    output before the residual add, and q/k get flat RMSNorms pre-reshape
    (reference definitions use the HF module tree; see
    gptqmodel/models/definitions/olmo2.py)."""
    base = _llama_config(hf)
    import dataclasses as _dc
    return _dc.replace(base, model_type="olmo2", qk_norm="flat",
                       norm_after_sublayer=True)


OLMO2_NAME_MAP = {
    "embed_tokens.weight": "model.embed_tokens.weight",
    "final_norm.weight": "model.norm.weight",
    "lm_head.weight": "lm_head.weight",
    # input_norm/post_norm slots hold the POST-sublayer norms (see
    # ModelConfig.norm_after_sublayer)
    "layers.{i}.input_norm.weight": "model.layers.{i}.post_attention_layernorm.weight",
    "layers.{i}.post_norm.weight": "model.layers.{i}.post_feedforward_layernorm.weight",
    "layers.{i}.attn.q.weight": "model.layers.{i}.self_attn.q_proj.weight",
    "layers.{i}.attn.k.weight": "model.layers.{i}.self_attn.k_proj.weight",
    "layers.{i}.attn.v.weight": "model.layers.{i}.self_attn.v_proj.weight",
    "layers.{i}.attn.o.weight": "model.layers.{i}.self_attn.o_proj.weight",
    "layers.{i}.attn.q_norm.weight": "model.layers.{i}.self_attn.q_norm.weight",
    "layers.{i}.attn.k_norm.weight": "model.layers.{i}.self_attn.k_norm.weight",
    "layers.{i}.mlp.gate.weight": "model.layers.{i}.mlp.gate_proj.weight",
    "layers.{i}.mlp.up.weight": "model.layers.{i}.mlp.up_proj.weight",
    "layers.{i}.mlp.down.weight": "model.layers.{i}.mlp.down_proj.weight",
}

register(ArchSpec(
    model_type="olmo2",
    make_config=_olmo2_config,
    name_map=OLMO2_NAME_MAP,
    layer_modules=LLAMA_LAYER_MODULES,
    module_slots=LLAMA_SLOTS,
))


def _instella_config(hf: Dict[str, Any]) -> ModelConfig:
    """Instella (AMD, modeling_instella.py remote code): the OLMo-2
    architecture verbatim — post-sublayer norms + flat pre-reshape q/k
    RMSNorms under the same model.layers.* names. The reference's definition
    is olmo2's with only the layer_type renamed
    (gptqmodel/models/definitions/instella.py vs olmo2.py)."""
    import dataclasses as _dc
    return _dc.replace(_olmo2_config(hf), model_type="instella")


register(ArchSpec(
    model_type="instella",
    make_config=_instella_config,
    name_map=OLMO2_NAME_MAP,
    layer_modules=LLAMA_LAYER_MODULES,
    module_slots=LLAMA_SLOTS,
))


# ------------------------------------------------------------------- stablelm
def _stablelm_config(hf: Dict[str, Any]) -> ModelConfig:
    """StableLM: llama-style gated MLP but LayerNorm (with bias) and partial
    rotary (rotary_pct of head_dim). The 12b's qk_layernorm and parallel
    residual variant are unsupported — raise instead of importing wrong."""
    if hf.get("qk_layernorm", False):
        raise NotImplementedError("stablelm qk_layernorm variant")
    if hf.get("use_parallel_residual", False):
        raise NotImplementedError("stablelm parallel-residual variant")
    heads = hf["num_attention_heads"]
    hd = hf["hidden_size"] // heads
    base = _llama_config(hf)
    import dataclasses as _dc
    return _dc.replace(
        base, model_type="stablelm",
        norm="layernorm",
        norm_eps=hf.get("layer_norm_eps", 1e-5),
        head_dim=hd,
        rotary_dim=int(hd * hf.get("partial_rotary_factor", 0.25)),
        attn_bias=hf.get("use_qkv_bias", False),
    )


STABLELM_NAME_MAP = dict(LLAMA_NAME_MAP)
STABLELM_NAME_MAP.update({
    "layers.{i}.input_norm.bias": "model.layers.{i}.input_layernorm.bias",
    "layers.{i}.post_norm.bias": "model.layers.{i}.post_attention_layernorm.bias",
    "final_norm.bias": "model.norm.bias",
})

register(ArchSpec(
    model_type="stablelm",
    make_config=_stablelm_config,
    name_map=STABLELM_NAME_MAP,
    layer_modules=LLAMA_LAYER_MODULES,
    module_slots=LLAMA_SLOTS,
))


# ----------------------------------------------------------------- starcoder2
def _starcoder2_config(hf: Dict[str, Any]) -> ModelConfig:
    heads = hf["num_attention_heads"]
    return ModelConfig(
        model_type="starcoder2",
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=heads,
        num_key_value_heads=hf.get("num_key_value_heads", heads),
        head_dim=hf["hidden_size"] // heads,
        max_position_embeddings=hf.get("max_position_embeddings", 4096),
        norm="layernorm",
        norm_eps=hf.get("norm_epsilon", 1e-5),
        act=hf.get("hidden_act", "gelu_pytorch_tanh"),
        gated_mlp=False,
        pos="rope",
        rope_theta=hf.get("rope_theta", 10000.0),
        attn_bias=hf.get("use_bias", True),
        mlp_bias=hf.get("use_bias", True),
        tie_word_embeddings=hf.get("tie_word_embeddings", True),
    )


STARCODER2_NAME_MAP = {
    "embed_tokens.weight": "model.embed_tokens.weight",
    "final_norm.weight": "model.norm.weight",
    "final_norm.bias": "model.norm.bias",
    "lm_head.weight": "lm_head.weight",
    "layers.{i}.input_norm.weight": "model.layers.{i}.input_layernorm.weight",
    "layers.{i}.input_norm.bias": "model.layers.{i}.input_layernorm.bias",
    "layers.{i}.post_norm.weight": "model.layers.{i}.post_attention_layernorm.weight",
    "layers.{i}.post_norm.bias": "model.layers.{i}.post_attention_layernorm.bias",
    "layers.{i}.attn.q.weight": "model.layers.{i}.self_attn.q_proj.weight",
    "layers.{i}.attn.k.weight": "model.layers.{i}.self_attn.k_proj.weight",
    "layers.{i}.attn.v.weight": "model.layers.{i}.self_attn.v_proj.weight",
    "layers.{i}.attn.o.weight": "model.layers.{i}.self_attn.o_proj.weight",
    "layers.{i}.attn.q.bias": "model.layers.{i}.self_attn.q_proj.bias",
    "layers.{i}.attn.k.bias": "model.layers.{i}.self_attn.k_proj.bias",
    "layers.{i}.attn.v.bias": "model.layers.{i}.self_attn.v_proj.bias",
    "layers.{i}.attn.o.bias": "model.layers.{i}.self_attn.o_proj.bias",
    "layers.{i}.mlp.up.weight": "model.layers.{i}.mlp.c_fc.weight",
    "layers.{i}.mlp.up.bias": "model.layers.{i}.mlp.c_fc.bias",
    "layers.{i}.mlp.down.weight": "model.layers.{i}.mlp.c_proj.weight",
    "layers.{i}.mlp.down.bias": "model.layers.{i}.mlp.c_proj.bias",
}

register(ArchSpec(
    model_type="starcoder2",
    make_config=_starcoder2_config,
    name_map=STARCODER2_NAME_MAP,
    layer_modules=[
        ["self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"],
        ["self_attn.o_proj"],
        ["mlp.c_fc"],
        ["mlp.c_proj"],
    ],
    module_slots={
        "self_attn.q_proj": "attn.q", "self_attn.k_proj": "attn.k",
        "self_attn.v_proj": "attn.v", "self_attn.o_proj": "attn.o",
        "mlp.c_fc": "mlp.up", "mlp.c_proj": "mlp.down",
    },
))


# ------------------------------------------------------------------- gpt_neox
def _gpt_neox_config(hf: Dict[str, Any]) -> ModelConfig:
    heads = hf["num_attention_heads"]
    hd = hf["hidden_size"] // heads
    return ModelConfig(
        model_type="gpt_neox",
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=heads,
        num_key_value_heads=heads,
        head_dim=hd,
        max_position_embeddings=hf.get("max_position_embeddings", 2048),
        norm="layernorm",
        norm_eps=hf.get("layer_norm_eps", 1e-5),
        act=hf.get("hidden_act", "gelu"),
        gated_mlp=False,
        pos="rope",
        rope_theta=hf.get("rotary_emb_base", 10000.0),
        rotary_dim=int(hd * hf.get("rotary_pct", 0.25)),
        parallel_residual=hf.get("use_parallel_residual", True),
        attn_bias=hf.get("attention_bias", True),
        mlp_bias=True,
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
    )


def _gpt_neox_convert_state(state: Dict[str, Any], hf: Dict[str, Any]) -> Dict[str, Any]:
    """Split the per-head-interleaved query_key_value fusion
    ([heads, 3, head_dim] rows) into plain q/k/v tensors."""
    import numpy as _np

    heads = hf["num_attention_heads"]
    h = hf["hidden_size"]
    hd = h // heads
    out: Dict[str, Any] = {}
    for k, v in state.items():
        v = _np.asarray(v)
        if ".attention.query_key_value." in k:
            base = k.replace("query_key_value", "{}")
            if k.endswith("weight"):
                w = v.reshape(heads, 3, hd, h)
                out[base.format("q_proj")] = _np.ascontiguousarray(
                    w[:, 0].reshape(h, h))
                out[base.format("k_proj")] = _np.ascontiguousarray(
                    w[:, 1].reshape(h, h))
                out[base.format("v_proj")] = _np.ascontiguousarray(
                    w[:, 2].reshape(h, h))
            else:
                b = v.reshape(heads, 3, hd)
                out[base.format("q_proj")] = _np.ascontiguousarray(
                    b[:, 0].reshape(h))
                out[base.format("k_proj")] = _np.ascontiguousarray(
                    b[:, 1].reshape(h))
                out[base.format("v_proj")] = _np.ascontiguousarray(
                    b[:, 2].reshape(h))
        else:
            out[k] = v
    return out


GPT_NEOX_NAME_MAP = {
    "embed_tokens.weight": "gpt_neox.embed_in.weight",
    "final_norm.weight": "gpt_neox.final_layer_norm.weight",
    "final_norm.bias": "gpt_neox.final_layer_norm.bias",
    "lm_head.weight": "embed_out.weight",
    "layers.{i}.input_norm.weight": "gpt_neox.layers.{i}.input_layernorm.weight",
    "layers.{i}.input_norm.bias": "gpt_neox.layers.{i}.input_layernorm.bias",
    "layers.{i}.post_norm.weight": "gpt_neox.layers.{i}.post_attention_layernorm.weight",
    "layers.{i}.post_norm.bias": "gpt_neox.layers.{i}.post_attention_layernorm.bias",
    "layers.{i}.attn.q.weight": "gpt_neox.layers.{i}.attention.q_proj.weight",
    "layers.{i}.attn.k.weight": "gpt_neox.layers.{i}.attention.k_proj.weight",
    "layers.{i}.attn.v.weight": "gpt_neox.layers.{i}.attention.v_proj.weight",
    "layers.{i}.attn.o.weight": "gpt_neox.layers.{i}.attention.dense.weight",
    "layers.{i}.attn.q.bias": "gpt_neox.layers.{i}.attention.q_proj.bias",
    "layers.{i}.attn.k.bias": "gpt_neox.layers.{i}.attention.k_proj.bias",
    "layers.{i}.attn.v.bias": "gpt_neox.layers.{i}.attention.v_proj.bias",
    "layers.{i}.attn.o.bias": "gpt_neox.layers.{i}.attention.dense.bias",
    "layers.{i}.mlp.up.weight": "gpt_neox.layers.{i}.mlp.dense_h_to_4h.weight",
    "layers.{i}.mlp.up.bias": "gpt_neox.layers.{i}.mlp.dense_h_to_4h.bias",
    "layers.{i}.mlp.down.weight": "gpt_neox.layers.{i}.mlp.dense_4h_to_h.weight",
    "layers.{i}.mlp.down.bias": "gpt_neox.layers.{i}.mlp.dense_4h_to_h.bias",
}

register(ArchSpec(
    model_type="gpt_neox",
    make_config=_gpt_neox_config,
    convert_state=_gpt_neox_convert_state,
    name_map=GPT_NEOX_NAME_MAP,
    layer_modules=[
        ["attention.q_proj", "attention.k_proj", "attention.v_proj"],
        ["attention.dense"],
        ["mlp.dense_h_to_4h"],
        ["mlp.dense_4h_to_h"],
    ],
    module_slots={
        "attention.q_proj": "attn.q", "attention.k_proj": "attn.k",
        "attention.v_proj": "attn.v", "attention.dense": "attn.o",
        "mlp.dense_h_to_4h": "mlp.up", "mlp.dense_4h_to_h": "mlp.down",
    },
    layers_prefix="gpt_neox.layers",
))


# ----------------------------------------------------------------------- bloom
def _bloom_config(hf: Dict[str, Any]) -> ModelConfig:
    heads = hf["n_head"]
    h = hf["hidden_size"]
    return ModelConfig(
        model_type="bloom",
        vocab_size=hf["vocab_size"],
        hidden_size=h,
        intermediate_size=4 * h,
        num_hidden_layers=hf["n_layer"],
        num_attention_heads=heads,
        num_key_value_heads=heads,
        head_dim=h // heads,
        max_position_embeddings=2048,
        norm="layernorm",
        norm_eps=hf.get("layer_norm_epsilon", 1e-5),
        act="gelu_tanh",
        gated_mlp=False,
        pos="alibi",
        embed_norm=True,
        attn_bias=True,
        mlp_bias=True,
        tie_word_embeddings=True,
    )


def _bloom_convert_state(state: Dict[str, Any], hf: Dict[str, Any]) -> Dict[str, Any]:
    """Split bloom's per-head-interleaved query_key_value fusion."""
    import numpy as _np

    heads = hf["n_head"]
    h = hf["hidden_size"]
    hd = h // heads
    out: Dict[str, Any] = {}
    for k, v in state.items():
        v = _np.asarray(v)
        if ".self_attention.query_key_value." in k:
            base = k.replace("query_key_value", "{}")
            if k.endswith("weight"):
                w = v.reshape(heads, 3, hd, h)
                for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
                    out[base.format(name)] = _np.ascontiguousarray(
                        w[:, i].reshape(h, h))
            else:
                b = v.reshape(heads, 3, hd)
                for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
                    out[base.format(name)] = _np.ascontiguousarray(
                        b[:, i].reshape(h))
        else:
            out[k] = v
    return out


BLOOM_NAME_MAP = {
    "embed_tokens.weight": "transformer.word_embeddings.weight",
    "embed_norm.weight": "transformer.word_embeddings_layernorm.weight",
    "embed_norm.bias": "transformer.word_embeddings_layernorm.bias",
    "final_norm.weight": "transformer.ln_f.weight",
    "final_norm.bias": "transformer.ln_f.bias",
    "lm_head.weight": "lm_head.weight",
    "layers.{i}.input_norm.weight": "transformer.h.{i}.input_layernorm.weight",
    "layers.{i}.input_norm.bias": "transformer.h.{i}.input_layernorm.bias",
    "layers.{i}.post_norm.weight": "transformer.h.{i}.post_attention_layernorm.weight",
    "layers.{i}.post_norm.bias": "transformer.h.{i}.post_attention_layernorm.bias",
    "layers.{i}.attn.q.weight": "transformer.h.{i}.self_attention.q_proj.weight",
    "layers.{i}.attn.k.weight": "transformer.h.{i}.self_attention.k_proj.weight",
    "layers.{i}.attn.v.weight": "transformer.h.{i}.self_attention.v_proj.weight",
    "layers.{i}.attn.o.weight": "transformer.h.{i}.self_attention.dense.weight",
    "layers.{i}.attn.q.bias": "transformer.h.{i}.self_attention.q_proj.bias",
    "layers.{i}.attn.k.bias": "transformer.h.{i}.self_attention.k_proj.bias",
    "layers.{i}.attn.v.bias": "transformer.h.{i}.self_attention.v_proj.bias",
    "layers.{i}.attn.o.bias": "transformer.h.{i}.self_attention.dense.bias",
    "layers.{i}.mlp.up.weight": "transformer.h.{i}.mlp.dense_h_to_4h.weight",
    "layers.{i}.mlp.up.bias": "transformer.h.{i}.mlp.dense_h_to_4h.bias",
    "layers.{i}.mlp.down.weight": "transformer.h.{i}.mlp.dense_4h_to_h.weight",
    "layers.{i}.mlp.down.bias": "transformer.h.{i}.mlp.dense_4h_to_h.bias",
}

register(ArchSpec(
    model_type="bloom",
    make_config=_bloom_config,
    convert_state=_bloom_convert_state,
    name_map=BLOOM_NAME_MAP,
    layer_modules=[
        ["self_attention.q_proj", "self_attention.k_proj",
         "self_attention.v_proj"],
        ["self_attention.dense"],
        ["mlp.dense_h_to_4h"],
        ["mlp.dense_4h_to_h"],
    ],
    module_slots={
        "self_attention.q_proj": "attn.q", "self_attention.k_proj": "attn.k",
        "self_attention.v_proj": "attn.v", "self_attention.dense": "attn.o",
        "mlp.dense_h_to_4h": "mlp.up", "mlp.dense_4h_to_h": "mlp.down",
    },
    layers_prefix="transformer.h",
))


# ---------------------------------------------------------------------- falcon
def _falcon_config(hf: Dict[str, Any]) -> ModelConfig:
    heads = hf["num_attention_heads"]
    h = hf["hidden_size"]
    hd = h // heads
    if hf.get("new_decoder_architecture", False):
        kv = hf.get("num_kv_heads", heads)
    elif hf.get("multi_query", True):
        kv = 1
    else:
        kv = heads
    return ModelConfig(
        model_type="falcon",
        vocab_size=hf["vocab_size"],
        hidden_size=h,
        intermediate_size=hf.get("ffn_hidden_size", 4 * h),
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=heads,
        num_key_value_heads=kv,
        head_dim=hd,
        max_position_embeddings=hf.get("max_position_embeddings", 2048),
        norm="layernorm",
        norm_eps=hf.get("layer_norm_epsilon", 1e-5),
        act="gelu",
        gated_mlp=False,
        pos="alibi" if hf.get("alibi", False) else "rope",
        rope_theta=hf.get("rope_theta", 10000.0),
        parallel_residual=hf.get("parallel_attn", True),
        attn_bias=hf.get("bias", False),
        mlp_bias=hf.get("bias", False),
        tie_word_embeddings=True,
    )


def _falcon_convert_state(state: Dict[str, Any], hf: Dict[str, Any]) -> Dict[str, Any]:
    """Normalize falcon naming: split fused query_key_value (q heads, then
    k, then v rows per kv group) and unify the norm names across the 7b
    (single ln) and new-decoder (ln_attn/ln_mlp) layouts."""
    import numpy as _np

    heads = hf["num_attention_heads"]
    h = hf["hidden_size"]
    hd = h // heads
    cfg = _falcon_config(hf)
    kv = cfg.num_key_value_heads
    out: Dict[str, Any] = {}
    for k, v in state.items():
        v = _np.asarray(v)
        if ".self_attention.query_key_value." in k and k.endswith("weight"):
            base = k.replace("query_key_value", "{}")
            if hf.get("new_decoder_architecture", False):
                # grouped layout: [kv groups, q_per_group + 2, hd, h]
                g = heads // kv
                w = v.reshape(kv, g + 2, hd, h)
                out[base.format("q_proj")] = _np.ascontiguousarray(
                    w[:, :g].reshape(heads * hd, h))
                out[base.format("k_proj")] = _np.ascontiguousarray(
                    w[:, g].reshape(kv * hd, h))
                out[base.format("v_proj")] = _np.ascontiguousarray(
                    w[:, g + 1].reshape(kv * hd, h))
            else:
                out[base.format("q_proj")] = _np.ascontiguousarray(v[:heads * hd])
                out[base.format("k_proj")] = _np.ascontiguousarray(
                    v[heads * hd:heads * hd + kv * hd])
                out[base.format("v_proj")] = _np.ascontiguousarray(
                    v[heads * hd + kv * hd:])
        elif ".ln_attn." in k:
            out[k.replace("ln_attn", "input_layernorm")] = v
        elif ".ln_mlp." in k:
            out[k.replace("ln_mlp", "mlp_layernorm")] = v
        elif ".input_layernorm." in k:
            # 7b-style single norm feeds both branches
            out[k] = v
            out[k.replace("input_layernorm", "mlp_layernorm")] = v.copy()
        else:
            out[k] = v
    return out


FALCON_NAME_MAP = {
    "embed_tokens.weight": "transformer.word_embeddings.weight",
    "final_norm.weight": "transformer.ln_f.weight",
    "final_norm.bias": "transformer.ln_f.bias",
    "lm_head.weight": "lm_head.weight",
    "layers.{i}.input_norm.weight": "transformer.h.{i}.input_layernorm.weight",
    "layers.{i}.input_norm.bias": "transformer.h.{i}.input_layernorm.bias",
    "layers.{i}.post_norm.weight": "transformer.h.{i}.mlp_layernorm.weight",
    "layers.{i}.post_norm.bias": "transformer.h.{i}.mlp_layernorm.bias",
    "layers.{i}.attn.q.weight": "transformer.h.{i}.self_attention.q_proj.weight",
    "layers.{i}.attn.k.weight": "transformer.h.{i}.self_attention.k_proj.weight",
    "layers.{i}.attn.v.weight": "transformer.h.{i}.self_attention.v_proj.weight",
    "layers.{i}.attn.o.weight": "transformer.h.{i}.self_attention.dense.weight",
    "layers.{i}.mlp.up.weight": "transformer.h.{i}.mlp.dense_h_to_4h.weight",
    "layers.{i}.mlp.down.weight": "transformer.h.{i}.mlp.dense_4h_to_h.weight",
}

register(ArchSpec(
    model_type="falcon",
    make_config=_falcon_config,
    convert_state=_falcon_convert_state,
    name_map=FALCON_NAME_MAP,
    layer_modules=[
        ["self_attention.q_proj", "self_attention.k_proj",
         "self_attention.v_proj"],
        ["self_attention.dense"],
        ["mlp.dense_h_to_4h"],
        ["mlp.dense_4h_to_h"],
    ],
    module_slots={
        "self_attention.q_proj": "attn.q", "self_attention.k_proj": "attn.k",
        "self_attention.v_proj": "attn.v", "self_attention.dense": "attn.o",
        "mlp.dense_h_to_4h": "mlp.up", "mlp.dense_4h_to_h": "mlp.down",
    },
    layers_prefix="transformer.h",
))


# --------------------------------------------------------------------- gemma2
def _gemma2_config(hf: Dict[str, Any]) -> ModelConfig:
    """Gemma2: gemma's (1+w) RMSNorm and embed scaling plus sandwich norms
    around both sublayers, tanh softcapping on attention scores and final
    logits, query_pre_attn_scalar attention scale, and sliding-window
    attention on alternate layers (reference definitions/gemma2.py; HF
    modeling_gemma2.py eager_attention_forward / Gemma2DecoderLayer)."""
    base = _llama_config(hf)
    import dataclasses as _dc
    layer_types = hf.get("layer_types") or tuple(
        "sliding_attention" if (i + 1) % 2 else "full_attention"
        for i in range(hf["num_hidden_layers"]))
    return _dc.replace(
        base,
        model_type="gemma2",
        head_dim=hf.get("head_dim", 256),
        rms_offset=1.0,
        embed_scale=hf["hidden_size"] ** 0.5,
        act=hf.get("hidden_activation") or hf.get("hidden_act",
                                                  "gelu_pytorch_tanh"),
        tie_word_embeddings=True,
        sandwich_norm=True,
        attn_scale=hf.get("query_pre_attn_scalar", 256) ** -0.5,
        attn_softcap=hf.get("attn_logit_softcapping", 50.0),
        logit_softcap=hf.get("final_logit_softcapping", 30.0),
        sliding_window=hf.get("sliding_window", 4096),
        layer_types=tuple(layer_types),
    )


GEMMA2_NAME_MAP = dict(LLAMA_NAME_MAP)
GEMMA2_NAME_MAP.update({
    "layers.{i}.post_attn_norm.weight":
        "model.layers.{i}.post_attention_layernorm.weight",
    "layers.{i}.post_norm.weight":
        "model.layers.{i}.pre_feedforward_layernorm.weight",
    "layers.{i}.post_mlp_norm.weight":
        "model.layers.{i}.post_feedforward_layernorm.weight",
})

register(ArchSpec(
    model_type="gemma2",
    make_config=_gemma2_config,
    name_map=GEMMA2_NAME_MAP,
    layer_modules=LLAMA_LAYER_MODULES,
    module_slots=LLAMA_SLOTS,
))


# ----------------------------------------------------------------------- gptj
# GPT-J-family: parallel attn+mlp residual off a SINGLE pre-norm (ln_1) and
# interleaved (rotate_every_two) partial rotary. The shared norm reuses the
# falcon-7b trick: the converter duplicates ln_1 into the post_norm slot so
# the parallel-residual branch needs no new machinery.
def _gptj_config(hf: Dict[str, Any]) -> ModelConfig:
    h = hf["n_embd"]
    heads = hf["n_head"]
    return ModelConfig(
        model_type="gptj",
        vocab_size=hf["vocab_size"],
        hidden_size=h,
        intermediate_size=hf.get("n_inner") or 4 * h,
        num_hidden_layers=hf["n_layer"],
        num_attention_heads=heads,
        num_key_value_heads=heads,
        head_dim=h // heads,
        max_position_embeddings=hf.get("n_positions", 2048),
        norm="layernorm",
        norm_eps=hf.get("layer_norm_epsilon", 1e-5),
        act=hf.get("activation_function", "gelu_new"),
        gated_mlp=False,
        pos="rope",
        rotary_dim=hf.get("rotary_dim") or h // heads,
        rope_interleaved=True,
        parallel_residual=True,
        attn_bias=False,
        mlp_bias=True,
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
    )


def _dup_shared_norm(state: Dict[str, Any], src: str, dst: str) -> Dict[str, Any]:
    """Copy the shared pre-norm into a separate name so input_norm and
    post_norm slots can both bind (parallel-residual single-norm family)."""
    import numpy as _np
    out = dict(state)
    for k, v in state.items():
        if f".{src}." in k:
            out[k.replace(f".{src}.", f".{dst}.")] = _np.asarray(v).copy()
    return out


GPTJ_NAME_MAP = {
    "embed_tokens.weight": "transformer.wte.weight",
    "final_norm.weight": "transformer.ln_f.weight",
    "final_norm.bias": "transformer.ln_f.bias",
    "lm_head.weight": "lm_head.weight",
    "lm_head.bias": "lm_head.bias",
    "layers.{i}.input_norm.weight": "transformer.h.{i}.ln_1.weight",
    "layers.{i}.input_norm.bias": "transformer.h.{i}.ln_1.bias",
    "layers.{i}.post_norm.weight": "transformer.h.{i}.ln_parallel.weight",
    "layers.{i}.post_norm.bias": "transformer.h.{i}.ln_parallel.bias",
    "layers.{i}.attn.q.weight": "transformer.h.{i}.attn.q_proj.weight",
    "layers.{i}.attn.k.weight": "transformer.h.{i}.attn.k_proj.weight",
    "layers.{i}.attn.v.weight": "transformer.h.{i}.attn.v_proj.weight",
    "layers.{i}.attn.o.weight": "transformer.h.{i}.attn.out_proj.weight",
    "layers.{i}.mlp.up.weight": "transformer.h.{i}.mlp.fc_in.weight",
    "layers.{i}.mlp.up.bias": "transformer.h.{i}.mlp.fc_in.bias",
    "layers.{i}.mlp.down.weight": "transformer.h.{i}.mlp.fc_out.weight",
    "layers.{i}.mlp.down.bias": "transformer.h.{i}.mlp.fc_out.bias",
}

register(ArchSpec(
    model_type="gptj",
    make_config=_gptj_config,
    convert_state=lambda s, hf: _dup_shared_norm(s, "ln_1", "ln_parallel"),
    name_map=GPTJ_NAME_MAP,
    layer_modules=[
        ["attn.q_proj", "attn.k_proj", "attn.v_proj"],
        ["attn.out_proj"],
        ["mlp.fc_in"],
        ["mlp.fc_out"],
    ],
    module_slots={
        "attn.q_proj": "attn.q", "attn.k_proj": "attn.k",
        "attn.v_proj": "attn.v", "attn.out_proj": "attn.o",
        "mlp.fc_in": "mlp.up", "mlp.fc_out": "mlp.down",
    },
    layers_prefix="transformer.h",
))


# ------------------------------------------------------------------------ phi
def _phi_config(hf: Dict[str, Any]) -> ModelConfig:
    """Phi-1/1.5/2: gptj-style parallel residual off one input_layernorm, but
    half-split (rotate_half) partial rotary, qkv biases and GQA support."""
    if hf.get("qk_layernorm", False):
        raise NotImplementedError("phi qk_layernorm variant")
    heads = hf["num_attention_heads"]
    hd = hf["hidden_size"] // heads
    return ModelConfig(
        model_type="phi",
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=heads,
        num_key_value_heads=hf.get("num_key_value_heads") or heads,
        head_dim=hd,
        max_position_embeddings=hf.get("max_position_embeddings", 2048),
        norm="layernorm",
        norm_eps=hf.get("layer_norm_eps", 1e-5),
        act=hf.get("hidden_act", "gelu_new"),
        gated_mlp=False,
        pos="rope",
        rope_theta=hf.get("rope_theta", 10000.0),
        rotary_dim=int(hd * hf.get("partial_rotary_factor", 0.5)),
        parallel_residual=True,
        attn_bias=True,
        mlp_bias=True,
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
    )


PHI_NAME_MAP = {
    "embed_tokens.weight": "model.embed_tokens.weight",
    "final_norm.weight": "model.final_layernorm.weight",
    "final_norm.bias": "model.final_layernorm.bias",
    "lm_head.weight": "lm_head.weight",
    "lm_head.bias": "lm_head.bias",
    "layers.{i}.input_norm.weight": "model.layers.{i}.input_layernorm.weight",
    "layers.{i}.input_norm.bias": "model.layers.{i}.input_layernorm.bias",
    "layers.{i}.post_norm.weight": "model.layers.{i}.ln_parallel.weight",
    "layers.{i}.post_norm.bias": "model.layers.{i}.ln_parallel.bias",
    "layers.{i}.attn.q.weight": "model.layers.{i}.self_attn.q_proj.weight",
    "layers.{i}.attn.q.bias": "model.layers.{i}.self_attn.q_proj.bias",
    "layers.{i}.attn.k.weight": "model.layers.{i}.self_attn.k_proj.weight",
    "layers.{i}.attn.k.bias": "model.layers.{i}.self_attn.k_proj.bias",
    "layers.{i}.attn.v.weight": "model.layers.{i}.self_attn.v_proj.weight",
    "layers.{i}.attn.v.bias": "model.layers.{i}.self_attn.v_proj.bias",
    "layers.{i}.attn.o.weight": "model.layers.{i}.self_attn.dense.weight",
    "layers.{i}.attn.o.bias": "model.layers.{i}.self_attn.dense.bias",
    "layers.{i}.mlp.up.weight": "model.layers.{i}.mlp.fc1.weight",
    "layers.{i}.mlp.up.bias": "model.layers.{i}.mlp.fc1.bias",
    "layers.{i}.mlp.down.weight": "model.layers.{i}.mlp.fc2.weight",
    "layers.{i}.mlp.down.bias": "model.layers.{i}.mlp.fc2.bias",
}

register(ArchSpec(
    model_type="phi",
    make_config=_phi_config,
    convert_state=lambda s, hf: _dup_shared_norm(
        s, "input_layernorm", "ln_parallel"),
    name_map=PHI_NAME_MAP,
    layer_modules=[
        ["self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"],
        ["self_attn.dense"],
        ["mlp.fc1"],
        ["mlp.fc2"],
    ],
    module_slots={
        "self_attn.q_proj": "attn.q", "self_attn.k_proj": "attn.k",
        "self_attn.v_proj": "attn.v", "self_attn.dense": "attn.o",
        "mlp.fc1": "mlp.up", "mlp.fc2": "mlp.down",
    },
))


# -------------------------------------------------------------------- codegen
def _codegen_config(hf: Dict[str, Any]) -> ModelConfig:
    base = _gptj_config(hf)
    import dataclasses as _dc
    return _dc.replace(base, model_type="codegen")


def _codegen_convert_state(state: Dict[str, Any], hf: Dict[str, Any]) -> Dict[str, Any]:
    """Split codegen's fused qkv_proj: rows are mp_num=4 blocks, each holding
    (query, value, key) slices of local_dim = hidden/mp_num rows
    (modeling_codegen.py:164-172 forward-time split order)."""
    import numpy as _np

    h = hf["n_embd"]
    mp_num = 4
    local = h // mp_num
    out: Dict[str, Any] = {}
    for k, v in state.items():
        v = _np.asarray(v)
        if k.endswith(".attn.qkv_proj.weight"):
            base = k.replace("qkv_proj", "{}")
            w = v.reshape(mp_num, 3 * local, h)
            out[base.format("q_proj")] = _np.ascontiguousarray(
                w[:, :local].reshape(h, h))
            out[base.format("v_proj")] = _np.ascontiguousarray(
                w[:, local:2 * local].reshape(h, h))
            out[base.format("k_proj")] = _np.ascontiguousarray(
                w[:, 2 * local:].reshape(h, h))
        else:
            out[k] = v
    return _dup_shared_norm(out, "ln_1", "ln_parallel")


CODEGEN_NAME_MAP = dict(GPTJ_NAME_MAP)

register(ArchSpec(
    model_type="codegen",
    make_config=_codegen_config,
    convert_state=_codegen_convert_state,
    name_map=CODEGEN_NAME_MAP,
    layer_modules=[
        ["attn.q_proj", "attn.k_proj", "attn.v_proj"],
        ["attn.out_proj"],
        ["mlp.fc_in"],
        ["mlp.fc_out"],
    ],
    module_slots={
        "attn.q_proj": "attn.q", "attn.k_proj": "attn.k",
        "attn.v_proj": "attn.v", "attn.out_proj": "attn.o",
        "mlp.fc_in": "mlp.up", "mlp.fc_out": "mlp.down",
    },
    layers_prefix="transformer.h",
))


# --------------------------------------------------------------------- cohere
def _cohere_config(hf: Dict[str, Any]) -> ModelConfig:
    """Cohere command-r: bias-free LayerNorm, parallel attn+mlp off ONE shared
    input_layernorm, interleaved full-dim rotary, logits scaled by
    logit_scale; command-r-plus adds per-head q/k LayerNorms (use_qk_norm)."""
    heads = hf["num_attention_heads"]
    return ModelConfig(
        model_type="cohere",
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=heads,
        num_key_value_heads=hf.get("num_key_value_heads") or heads,
        head_dim=hf.get("head_dim") or hf["hidden_size"] // heads,
        max_position_embeddings=hf.get("max_position_embeddings", 8192),
        norm="layernorm",
        norm_eps=hf.get("layer_norm_eps", 1e-5),
        act=hf.get("hidden_act", "silu"),
        gated_mlp=True,
        pos="rope",
        rope_theta=hf.get("rope_theta", 10000.0),
        rope_interleaved=True,
        parallel_residual=True,
        qk_norm="cohere" if hf.get("use_qk_norm", False) else False,
        attn_bias=hf.get("attention_bias", False),
        mlp_bias=False,
        tie_word_embeddings=hf.get("tie_word_embeddings", True),
        logit_scale=hf.get("logit_scale", 0.0625),
    )


COHERE_NAME_MAP = {
    "embed_tokens.weight": "model.embed_tokens.weight",
    "final_norm.weight": "model.norm.weight",
    "lm_head.weight": "lm_head.weight",
    "layers.{i}.input_norm.weight": "model.layers.{i}.input_layernorm.weight",
    "layers.{i}.post_norm.weight": "model.layers.{i}.ln_parallel.weight",
    "layers.{i}.attn.q.weight": "model.layers.{i}.self_attn.q_proj.weight",
    "layers.{i}.attn.k.weight": "model.layers.{i}.self_attn.k_proj.weight",
    "layers.{i}.attn.v.weight": "model.layers.{i}.self_attn.v_proj.weight",
    "layers.{i}.attn.o.weight": "model.layers.{i}.self_attn.o_proj.weight",
    "layers.{i}.attn.q.bias": "model.layers.{i}.self_attn.q_proj.bias",
    "layers.{i}.attn.k.bias": "model.layers.{i}.self_attn.k_proj.bias",
    "layers.{i}.attn.v.bias": "model.layers.{i}.self_attn.v_proj.bias",
    "layers.{i}.attn.q_norm.weight": "model.layers.{i}.self_attn.q_norm.weight",
    "layers.{i}.attn.k_norm.weight": "model.layers.{i}.self_attn.k_norm.weight",
    "layers.{i}.mlp.gate.weight": "model.layers.{i}.mlp.gate_proj.weight",
    "layers.{i}.mlp.up.weight": "model.layers.{i}.mlp.up_proj.weight",
    "layers.{i}.mlp.down.weight": "model.layers.{i}.mlp.down_proj.weight",
}

register(ArchSpec(
    model_type="cohere",
    make_config=_cohere_config,
    convert_state=lambda s, hf: _dup_shared_norm(
        s, "input_layernorm", "ln_parallel"),
    name_map=COHERE_NAME_MAP,
    layer_modules=LLAMA_LAYER_MODULES,
    module_slots=LLAMA_SLOTS,
))


# -------------------------------------------------------------------- granite
def _granite_config(hf: Dict[str, Any]) -> ModelConfig:
    """Granite 3.x: llama structure plus four fixed multipliers —
    embedding_multiplier on the embed, attention_multiplier as the attention
    scale, residual_multiplier on every sublayer output, and logits divided
    by logits_scaling (modeling_granite.py 'main diff with Llama' sites)."""
    base = _llama_config(hf)
    import dataclasses as _dc
    return _dc.replace(
        base,
        model_type="granite",
        embed_scale=hf.get("embedding_multiplier", 1.0),
        attn_scale=hf.get("attention_multiplier"),
        residual_multiplier=hf.get("residual_multiplier", 1.0),
        logit_scale=1.0 / hf.get("logits_scaling", 1.0),
    )


register(ArchSpec(
    model_type="granite",
    make_config=_granite_config,
    name_map=LLAMA_NAME_MAP,
    layer_modules=LLAMA_LAYER_MODULES,
    module_slots=LLAMA_SLOTS,
))


# ------------------------------------------------------------------------ glm
def _glm_config(hf: Dict[str, Any]) -> ModelConfig:
    """GLM-4 (HF native 'glm'): llama flow with interleaved PARTIAL rotary
    (first partial_rotary_factor of head_dim, adjacent-lane pairs), qkv
    biases, and a fused gate_up_proj split at import."""
    heads = hf["num_attention_heads"]
    hd = hf.get("head_dim") or hf["hidden_size"] // heads
    base = _llama_config(hf)
    import dataclasses as _dc
    return _dc.replace(
        base,
        model_type="glm",
        head_dim=hd,
        rotary_dim=int(hd * hf.get("partial_rotary_factor", 0.5)),
        rope_interleaved=True,
        attn_bias=hf.get("attention_bias", True),
    )


def _glm_convert_state(state: Dict[str, Any], hf: Dict[str, Any]) -> Dict[str, Any]:
    """Split glm's fused gate_up_proj ([gate; up] rows, chunk order in
    modeling_glm.py GlmMLP.forward)."""
    import numpy as _np

    inter = hf["intermediate_size"]
    out: Dict[str, Any] = {}
    for k, v in state.items():
        v = _np.asarray(v)
        if ".mlp.gate_up_proj." in k:
            base = k.replace("gate_up_proj", "{}")
            out[base.format("gate_proj")] = _np.ascontiguousarray(v[:inter])
            out[base.format("up_proj")] = _np.ascontiguousarray(v[inter:])
        else:
            out[k] = v
    return out


register(ArchSpec(
    model_type="glm",
    make_config=_glm_config,
    convert_state=_glm_convert_state,
    name_map=LLAMA_NAME_MAP,
    layer_modules=LLAMA_LAYER_MODULES,
    module_slots=LLAMA_SLOTS,
))


# ------------------------------------------------------------------------ mpt
def _mpt_config(hf: Dict[str, Any]) -> ModelConfig:
    """MPT: bias-free linears, mosaic-grid ALiBi (alibi_bias_max=8,
    odd/even-interleaved slopes), optional qkv clamping, ungated exact-gelu
    MLP at expansion_ratio*d_model."""
    attn = hf.get("attn_config") or {}
    if isinstance(attn, dict):
        alibi = attn.get("alibi", True)
        clip_qkv = attn.get("clip_qkv")
        softmax_scale = attn.get("softmax_scale")
    else:  # MptAttentionConfig object survived to_dict in odd paths
        alibi = getattr(attn, "alibi", True)
        clip_qkv = getattr(attn, "clip_qkv", None)
        softmax_scale = getattr(attn, "softmax_scale", None)
    if not alibi:
        raise NotImplementedError("mpt rope/absolute variants (alibi=False)")
    h = hf["d_model"]
    heads = hf["n_heads"]
    return ModelConfig(
        model_type="mpt",
        vocab_size=hf["vocab_size"],
        hidden_size=h,
        intermediate_size=int(hf.get("expansion_ratio", 4) * h),
        num_hidden_layers=hf["n_layers"],
        num_attention_heads=heads,
        num_key_value_heads=heads,
        head_dim=h // heads,
        max_position_embeddings=hf.get("max_seq_len", 2048),
        norm="layernorm",
        norm_eps=hf.get("layer_norm_epsilon", 1e-5),
        act="gelu",
        gated_mlp=False,
        pos="alibi",
        alibi_kind="mpt",
        clip_qkv=clip_qkv,
        attn_scale=softmax_scale,
        attn_bias=not hf.get("no_bias", True),
        mlp_bias=not hf.get("no_bias", True),
        tie_word_embeddings=True,
    )


def _mpt_convert_state(state: Dict[str, Any], hf: Dict[str, Any]) -> Dict[str, Any]:
    """Split the straight [q; k; v] Wqkv fusion."""
    import numpy as _np
    h = hf["d_model"]
    out: Dict[str, Any] = {}
    for k, v in state.items():
        v = _np.asarray(v)
        if ".attn.Wqkv." in k:
            base = k.replace("Wqkv", "{}")
            out[base.format("q_proj")] = _np.ascontiguousarray(v[:h])
            out[base.format("k_proj")] = _np.ascontiguousarray(v[h:2 * h])
            out[base.format("v_proj")] = _np.ascontiguousarray(v[2 * h:])
        else:
            out[k] = v
    return out


MPT_NAME_MAP = {
    "embed_tokens.weight": "transformer.wte.weight",
    "final_norm.weight": "transformer.norm_f.weight",
    "final_norm.bias": "transformer.norm_f.bias",
    "lm_head.weight": "lm_head.weight",
    "layers.{i}.input_norm.weight": "transformer.blocks.{i}.norm_1.weight",
    "layers.{i}.input_norm.bias": "transformer.blocks.{i}.norm_1.bias",
    "layers.{i}.post_norm.weight": "transformer.blocks.{i}.norm_2.weight",
    "layers.{i}.post_norm.bias": "transformer.blocks.{i}.norm_2.bias",
    "layers.{i}.attn.q.weight": "transformer.blocks.{i}.attn.q_proj.weight",
    "layers.{i}.attn.k.weight": "transformer.blocks.{i}.attn.k_proj.weight",
    "layers.{i}.attn.v.weight": "transformer.blocks.{i}.attn.v_proj.weight",
    "layers.{i}.attn.o.weight": "transformer.blocks.{i}.attn.out_proj.weight",
    "layers.{i}.mlp.up.weight": "transformer.blocks.{i}.ffn.up_proj.weight",
    "layers.{i}.mlp.down.weight": "transformer.blocks.{i}.ffn.down_proj.weight",
}

register(ArchSpec(
    model_type="mpt",
    make_config=_mpt_config,
    convert_state=_mpt_convert_state,
    name_map=MPT_NAME_MAP,
    layer_modules=[
        ["attn.q_proj", "attn.k_proj", "attn.v_proj"],
        ["attn.out_proj"],
        ["ffn.up_proj"],
        ["ffn.down_proj"],
    ],
    module_slots={
        "attn.q_proj": "attn.q", "attn.k_proj": "attn.k",
        "attn.v_proj": "attn.v", "attn.out_proj": "attn.o",
        "ffn.up_proj": "mlp.up", "ffn.down_proj": "mlp.down",
    },
    layers_prefix="transformer.blocks",
))


# ----------------------------------------------------------------- gpt_bigcode
def _gpt_bigcode_config(hf: Dict[str, Any]) -> ModelConfig:
    """GPT-BigCode (santacoder/starcoder1): MQA (kv_heads=1) behind a fused
    c_attn, learned positions, plain nn.Linear (NOT gpt2's Conv1D)."""
    h = hf["n_embd"]
    heads = hf["n_head"]
    return ModelConfig(
        model_type="gpt_bigcode",
        vocab_size=hf["vocab_size"],
        hidden_size=h,
        intermediate_size=hf.get("n_inner") or 4 * h,
        num_hidden_layers=hf["n_layer"],
        num_attention_heads=heads,
        num_key_value_heads=1 if hf.get("multi_query", True) else heads,
        head_dim=h // heads,
        max_position_embeddings=hf.get("n_positions", 8192),
        norm="layernorm",
        norm_eps=hf.get("layer_norm_epsilon", 1e-5),
        act=hf.get("activation_function", "gelu_pytorch_tanh"),
        gated_mlp=False,
        pos="learned",
        attn_scale=(h // heads) ** -0.5 if hf.get("scale_attn_weights", True)
                   else 1.0,
        attn_bias=True,
        mlp_bias=True,
        tie_word_embeddings=True,
    )


def _gpt_bigcode_convert_state(state: Dict[str, Any], hf: Dict[str, Any]) -> Dict[str, Any]:
    """Split c_attn: multi-query rows are [q (h); k (hd); v (hd)]; the MHA
    variant interleaves per head like gpt-neox."""
    import numpy as _np
    h = hf["n_embd"]
    heads = hf["n_head"]
    hd = h // heads
    mq = hf.get("multi_query", True)
    out: Dict[str, Any] = {}
    for k, v in state.items():
        v = _np.asarray(v)
        if ".attn.c_attn." in k:
            base = k.replace("c_attn", "{}")
            if mq:
                out[base.format("q_proj")] = _np.ascontiguousarray(v[:h])
                out[base.format("k_proj")] = _np.ascontiguousarray(v[h:h + hd])
                out[base.format("v_proj")] = _np.ascontiguousarray(v[h + hd:])
            else:
                w = v.reshape(heads, 3 * hd, *v.shape[1:])
                out[base.format("q_proj")] = _np.ascontiguousarray(
                    w[:, :hd].reshape(h, *v.shape[1:]))
                out[base.format("k_proj")] = _np.ascontiguousarray(
                    w[:, hd:2 * hd].reshape(h, *v.shape[1:]))
                out[base.format("v_proj")] = _np.ascontiguousarray(
                    w[:, 2 * hd:].reshape(h, *v.shape[1:]))
        else:
            out[k] = v
    return out


GPT_BIGCODE_NAME_MAP = {
    "embed_tokens.weight": "transformer.wte.weight",
    "embed_positions.weight": "transformer.wpe.weight",
    "final_norm.weight": "transformer.ln_f.weight",
    "final_norm.bias": "transformer.ln_f.bias",
    "lm_head.weight": "lm_head.weight",
    "layers.{i}.input_norm.weight": "transformer.h.{i}.ln_1.weight",
    "layers.{i}.input_norm.bias": "transformer.h.{i}.ln_1.bias",
    "layers.{i}.post_norm.weight": "transformer.h.{i}.ln_2.weight",
    "layers.{i}.post_norm.bias": "transformer.h.{i}.ln_2.bias",
    "layers.{i}.attn.q.weight": "transformer.h.{i}.attn.q_proj.weight",
    "layers.{i}.attn.q.bias": "transformer.h.{i}.attn.q_proj.bias",
    "layers.{i}.attn.k.weight": "transformer.h.{i}.attn.k_proj.weight",
    "layers.{i}.attn.k.bias": "transformer.h.{i}.attn.k_proj.bias",
    "layers.{i}.attn.v.weight": "transformer.h.{i}.attn.v_proj.weight",
    "layers.{i}.attn.v.bias": "transformer.h.{i}.attn.v_proj.bias",
    "layers.{i}.attn.o.weight": "transformer.h.{i}.attn.c_proj.weight",
    "layers.{i}.attn.o.bias": "transformer.h.{i}.attn.c_proj.bias",
    "layers.{i}.mlp.up.weight": "transformer.h.{i}.mlp.c_fc.weight",
    "layers.{i}.mlp.up.bias": "transformer.h.{i}.mlp.c_fc.bias",
    "layers.{i}.mlp.down.weight": "transformer.h.{i}.mlp.c_proj.weight",
    "layers.{i}.mlp.down.bias": "transformer.h.{i}.mlp.c_proj.bias",
}

register(ArchSpec(
    model_type="gpt_bigcode",
    make_config=_gpt_bigcode_config,
    convert_state=_gpt_bigcode_convert_state,
    name_map=GPT_BIGCODE_NAME_MAP,
    layer_modules=GPT2_LAYER_MODULES,
    module_slots=GPT2_SLOTS,
    layers_prefix="transformer.h",
))


# ------------------------------------------------------------------- qwen2_vl
def _qwen2_vl_config(hf: Dict[str, Any]) -> ModelConfig:
    """Qwen2-VL TEXT decoder (reference definitions/qwen2_vl.py): a qwen2
    decoder (qkv biases) whose rope is "mrope" with temporal/height/width
    sections. For text-only inputs all three mrope position streams are the
    SAME sequence index, which makes mrope numerically identical to standard
    rope — so the text decoder imports onto plain-rope qwen2 knobs exactly.
    The vision tower (``visual.*``) is descoped (SURVEY §7.5): calibration
    and serving are text-only."""
    import dataclasses as _dc
    base = _llama_config(hf)
    rs = hf.get("rope_scaling")
    # transformers normalizes {"type": "mrope"} to rope_type "default" while
    # keeping mrope_section — either form is plain rope for text-only
    if rs and (rs.get("rope_type", rs.get("type")) == "mrope"
               or "mrope_section" in rs):
        rs = None                       # text-only: mrope == plain rope
    return _dc.replace(base, model_type="qwen2_vl", rope_scaling=rs)


def _qwen2_vl_convert_state(state: Dict[str, Any],
                            hf: Dict[str, Any]) -> Dict[str, Any]:
    """Normalize the legacy flat layout (model.layers.* + visual.*) onto the
    current nested one (model.language_model.*); visual tower keys are left
    behind (unmapped keys are ignored by the importer)."""
    if any(k.startswith("model.language_model.") for k in state):
        return state
    out = {}
    for k, v in state.items():
        if k.startswith("model.") and not k.startswith("model.visual"):
            out["model.language_model." + k[len("model."):]] = v
        else:
            out[k] = v
    return out


QWEN2_VL_NAME_MAP = {
    ours: theirs.replace("model.", "model.language_model.", 1)
    for ours, theirs in LLAMA_NAME_MAP.items()
}

register(ArchSpec(
    model_type="qwen2_vl",
    make_config=_qwen2_vl_config,
    name_map=QWEN2_VL_NAME_MAP,
    convert_state=_qwen2_vl_convert_state,
    layer_modules=LLAMA_LAYER_MODULES,
    module_slots=LLAMA_SLOTS,
    layers_prefix="model.language_model.layers",
))


# --------------------------------------------------------------------- mllama
def _mllama_config(hf: Dict[str, Any]) -> ModelConfig:
    """Mllama (Llama-3.2-Vision) TEXT decoder (reference
    definitions/mllama.py): llama layers under model.language_model.*, where
    text_config.cross_attention_layers marks a subset of layers as gated
    CROSS-attention layers against the vision tower. For text-only inputs HF
    skips those layers entirely (modeling_mllama.py MllamaTextModel.forward:
    "For text-only path we should skip cross attention layers"), so the
    text-only decoder is exactly llama over the remaining self-attention
    layers — ``convert_state`` drops the cross-attn layers and renumbers the
    rest contiguously. Vision tower + multi_modal_projector are descoped
    (SURVEY §7.5; calibration and serving are text-only). The embed table
    carries vocab_size+8 image-special rows (harmless for lookup); lm_head
    is always untied."""
    import dataclasses as _dc
    tc = dict(hf.get("text_config") or hf)
    n_cross = len(tc.get("cross_attention_layers") or ())
    base = _llama_config(tc)
    return _dc.replace(
        base, model_type="mllama",
        num_hidden_layers=base.num_hidden_layers - n_cross,
        tie_word_embeddings=False)


def _mllama_convert_state(state: Dict[str, Any],
                          hf: Dict[str, Any]) -> Dict[str, Any]:
    """Drop gated cross-attention layers, renumber the self-attn layers
    contiguously onto model.layers.*, and normalize the legacy flat layout
    (language_model.model.* + language_model.lm_head) onto the nested one
    first. Vision-tower keys fall through unmapped (ignored at import)."""
    if any(k.startswith("language_model.model.") for k in state):
        norm = {}
        for k, v in state.items():
            if k.startswith("language_model.model."):
                norm["model.language_model."
                     + k[len("language_model.model."):]] = v
            elif k == "language_model.lm_head.weight":
                norm["lm_head.weight"] = v
            else:
                norm[k] = v
        state = norm
    tc = hf.get("text_config") or hf
    cross = set(tc.get("cross_attention_layers") or ())
    new_idx = {}
    for i in range(tc["num_hidden_layers"]):
        if i not in cross:
            new_idx[i] = len(new_idx)
    out = {}
    pre = "model.language_model.layers."
    for k, v in state.items():
        if k.startswith(pre):
            i_str, _, tail = k[len(pre):].partition(".")
            i = int(i_str)
            if i in cross:
                continue          # gated cross-attn layer: text-only skip
            out[f"model.layers.{new_idx[i]}.{tail}"] = v
        elif k.startswith("model.language_model."):
            out["model." + k[len("model.language_model."):]] = v
        else:
            out[k] = v
    return out


register(ArchSpec(
    model_type="mllama",
    make_config=_mllama_config,
    name_map=LLAMA_NAME_MAP,
    convert_state=_mllama_convert_state,
    layer_modules=LLAMA_LAYER_MODULES,
    module_slots=LLAMA_SLOTS,
))


# ----------------------------------------------------------------- ovis/ovis2
# Ovis (AIDC-AI, reference definitions/ovis.py): a wrapper holding an inner
# LLM (``llm.*``: Llama, Gemma2 or Qwen2 per release) plus a visual tokenizer
# + visual-token embedding (``visual_tokenizer``/``vte`` — descoped, SURVEY
# §7.5: text-only). The inner decoder type is only known from the config, so
# the spec RESOLVES per config: the inner arch's name_map/make_config under
# the wrapper's model_type. Text-only forward is exactly the inner decoder.
def _ovis_llm_config(hf: Dict[str, Any]) -> Dict[str, Any]:
    return dict(hf.get("llm_config") or hf.get("text_config") or hf)


def _ovis_convert_state(state: Dict[str, Any],
                        hf: Dict[str, Any]) -> Dict[str, Any]:
    """llm.model.* -> model.*, llm.lm_head -> lm_head; visual_tokenizer/vte
    keys pass through unmapped (ignored at import)."""
    return {(k[len("llm."):] if k.startswith("llm.") else k): v
            for k, v in state.items()}


def _ovis_resolve(hf: Dict[str, Any]) -> ArchSpec:
    import dataclasses as _dc
    tc = _ovis_llm_config(hf)
    mt = tc.get("model_type", "llama")
    # a flat re-synthesized config (from_torch_model save path) carries the
    # wrapper's own model_type — fall back to the default inner decoder
    inner = get_spec("llama" if mt == "ovis" else mt)

    def conv(state, hfc, _inner=inner):
        state = _ovis_convert_state(state, hfc)
        if _inner.convert_state is not None:
            state = _inner.convert_state(state, _ovis_llm_config(hfc))
        return state

    def mk(_hf, _inner=inner, _tc=tc):
        return dataclasses_replace(_inner.make_config(_tc),
                                   model_type="ovis")

    return _dc.replace(inner, model_type="ovis", make_config=mk,
                       convert_state=conv, resolve=None)


def _ovis2_resolve(hf: Dict[str, Any]) -> ArchSpec:
    """Ovis2 (transformers-native): the inner decoder (qwen2 in all released
    checkpoints) lives under ``model.language_model.*`` with a top-level
    untied lm_head; the composite config reports tie_word_embeddings=True
    while text_config says False — trust the text config + tensors."""
    import dataclasses as _dc
    tc = dict(hf.get("text_config") or hf)
    mt = tc.get("model_type", "qwen2")
    inner = get_spec("qwen2" if mt == "ovis2" else mt)
    name_map = {ours: theirs.replace("model.", "model.language_model.", 1)
                for ours, theirs in inner.name_map.items()}

    def mk(_hf, _inner=inner, _tc=tc):
        return dataclasses_replace(
            _inner.make_config(_tc), model_type="ovis2",
            tie_word_embeddings=bool(_tc.get("tie_word_embeddings", False)))

    return _dc.replace(inner, model_type="ovis2", make_config=mk,
                       name_map=name_map, convert_state=None, resolve=None,
                       layers_prefix="model.language_model.layers")


register(ArchSpec(
    model_type="ovis",
    make_config=lambda hf: _ovis_resolve(hf).make_config(hf),
    resolve=_ovis_resolve,
    name_map=LLAMA_NAME_MAP,
    layer_modules=LLAMA_LAYER_MODULES,
    module_slots=LLAMA_SLOTS,
))

register(ArchSpec(
    model_type="ovis2",
    make_config=lambda hf: _ovis2_resolve(hf).make_config(hf),
    resolve=_ovis2_resolve,
    name_map=LLAMA_NAME_MAP,
    layer_modules=LLAMA_LAYER_MODULES,
    module_slots=LLAMA_SLOTS,
    layers_prefix="model.language_model.layers",
))


# ------------------------------------------------------------------- qwen2_moe
def _qwen2_moe_config(hf: Dict[str, Any]) -> ModelConfig:
    """Qwen2-MoE (qwen1.5-moe/qwen2-57b-a14b): mixtral-style router WITHOUT
    top-k renorm by default (norm_topk_prob) plus an always-on shared expert
    behind a sigmoid scalar gate. Layers in mlp_only_layers (or off the
    decoder_sparse_step grid) fall back to a dense MLP."""
    base = _llama_config(hf)
    import dataclasses as _dc
    step = hf.get("decoder_sparse_step", 1)
    mlp_only = set(hf.get("mlp_only_layers") or [])
    n = hf["num_hidden_layers"]
    ne = hf.get("num_experts", 60)
    sparse = [i not in mlp_only and ne > 0 and (i + 1) % max(step, 1) == 0
              for i in range(n)]
    if not all(sparse):
        # heterogeneous layers load fine (per-layer moe/mlp slots); flag the
        # stacked serving path off via layer_types-style inspection upstream
        pass
    return _dc.replace(
        base, model_type="qwen2_moe",
        num_experts=ne,
        num_experts_per_tok=hf.get("num_experts_per_tok", 4),
        moe_norm_topk=hf.get("norm_topk_prob", False),
    )


QWEN2_MOE_NAME_MAP = dict(LLAMA_NAME_MAP)
QWEN2_MOE_NAME_MAP.update({
    "layers.{i}.moe.router.weight": "model.layers.{i}.mlp.gate.weight",
    "layers.{i}.moe.experts.{e}.gate.weight":
        "model.layers.{i}.mlp.experts.{e}.gate_proj.weight",
    "layers.{i}.moe.experts.{e}.up.weight":
        "model.layers.{i}.mlp.experts.{e}.up_proj.weight",
    "layers.{i}.moe.experts.{e}.down.weight":
        "model.layers.{i}.mlp.experts.{e}.down_proj.weight",
    "layers.{i}.moe.shared.gate.weight":
        "model.layers.{i}.mlp.shared_expert.gate_proj.weight",
    "layers.{i}.moe.shared.up.weight":
        "model.layers.{i}.mlp.shared_expert.up_proj.weight",
    "layers.{i}.moe.shared.down.weight":
        "model.layers.{i}.mlp.shared_expert.down_proj.weight",
    "layers.{i}.moe.shared_gate.weight":
        "model.layers.{i}.mlp.shared_expert_gate.weight",
})

QWEN2_MOE_LAYER_MODULES = [
    ["self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"],
    ["self_attn.o_proj"],
    ["mlp.shared_expert.gate_proj", "mlp.shared_expert.up_proj",
     "mlp.experts.{e}.gate_proj", "mlp.experts.{e}.up_proj"],
    ["mlp.shared_expert.down_proj", "mlp.experts.{e}.down_proj"],
]

QWEN2_MOE_SLOTS = {
    "self_attn.q_proj": "attn.q", "self_attn.k_proj": "attn.k",
    "self_attn.v_proj": "attn.v", "self_attn.o_proj": "attn.o",
    "mlp.experts.{e}.gate_proj": "moe.experts.{e}.gate",
    "mlp.experts.{e}.up_proj": "moe.experts.{e}.up",
    "mlp.experts.{e}.down_proj": "moe.experts.{e}.down",
    "mlp.shared_expert.gate_proj": "moe.shared.gate",
    "mlp.shared_expert.up_proj": "moe.shared.up",
    "mlp.shared_expert.down_proj": "moe.shared.down",
}

register(ArchSpec(
    model_type="qwen2_moe",
    make_config=_qwen2_moe_config,
    name_map=QWEN2_MOE_NAME_MAP,
    layer_modules=QWEN2_MOE_LAYER_MODULES,
    module_slots=QWEN2_MOE_SLOTS,
))


# -------------------------------------------------------------------- qwen3_moe
def _qwen3_moe_config(hf: Dict[str, Any]) -> ModelConfig:
    """Qwen3-MoE: qwen3's per-head q/k RMSNorms + mixtral-style experts with
    norm_topk_prob renorm (default True), no shared expert."""
    base = _llama_config(hf)
    import dataclasses as _dc
    return _dc.replace(
        base, model_type="qwen3_moe",
        qk_norm=True,
        num_experts=hf.get("num_experts", 128),
        num_experts_per_tok=hf.get("num_experts_per_tok", 8),
        moe_norm_topk=hf.get("norm_topk_prob", True),
    )


QWEN3_MOE_NAME_MAP = dict(QWEN3_NAME_MAP)
QWEN3_MOE_NAME_MAP.update({
    "layers.{i}.moe.router.weight": "model.layers.{i}.mlp.gate.weight",
    "layers.{i}.moe.experts.{e}.gate.weight":
        "model.layers.{i}.mlp.experts.{e}.gate_proj.weight",
    "layers.{i}.moe.experts.{e}.up.weight":
        "model.layers.{i}.mlp.experts.{e}.up_proj.weight",
    "layers.{i}.moe.experts.{e}.down.weight":
        "model.layers.{i}.mlp.experts.{e}.down_proj.weight",
})

register(ArchSpec(
    model_type="qwen3_moe",
    make_config=_qwen3_moe_config,
    name_map=QWEN3_MOE_NAME_MAP,
    layer_modules=[
        ["self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"],
        ["self_attn.o_proj"],
        ["mlp.experts.{e}.gate_proj", "mlp.experts.{e}.up_proj"],
        ["mlp.experts.{e}.down_proj"],
    ],
    module_slots={
        "self_attn.q_proj": "attn.q", "self_attn.k_proj": "attn.k",
        "self_attn.v_proj": "attn.v", "self_attn.o_proj": "attn.o",
        "mlp.experts.{e}.gate_proj": "moe.experts.{e}.gate",
        "mlp.experts.{e}.up_proj": "moe.experts.{e}.up",
        "mlp.experts.{e}.down_proj": "moe.experts.{e}.down",
    },
))


# ----------------------------------------------------------------------- olmoe
def _olmoe_config(hf: Dict[str, Any]) -> ModelConfig:
    """OLMoE: flat (pre-reshape) q/k RMSNorms like olmo2 but with standard
    pre-norm layers, 64 experts top-8 without renorm by default."""
    base = _llama_config(hf)
    import dataclasses as _dc
    return _dc.replace(
        base, model_type="olmoe",
        qk_norm="flat",
        num_experts=hf.get("num_experts", 64),
        num_experts_per_tok=hf.get("num_experts_per_tok", 8),
        moe_norm_topk=hf.get("norm_topk_prob", False),
    )


OLMOE_NAME_MAP = dict(QWEN3_NAME_MAP)  # includes q_norm/k_norm entries
OLMOE_NAME_MAP.update({
    "layers.{i}.moe.router.weight": "model.layers.{i}.mlp.gate.weight",
    "layers.{i}.moe.experts.{e}.gate.weight":
        "model.layers.{i}.mlp.experts.{e}.gate_proj.weight",
    "layers.{i}.moe.experts.{e}.up.weight":
        "model.layers.{i}.mlp.experts.{e}.up_proj.weight",
    "layers.{i}.moe.experts.{e}.down.weight":
        "model.layers.{i}.mlp.experts.{e}.down_proj.weight",
})

register(ArchSpec(
    model_type="olmoe",
    make_config=_olmoe_config,
    name_map=OLMOE_NAME_MAP,
    layer_modules=[
        ["self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"],
        ["self_attn.o_proj"],
        ["mlp.experts.{e}.gate_proj", "mlp.experts.{e}.up_proj"],
        ["mlp.experts.{e}.down_proj"],
    ],
    module_slots={
        "self_attn.q_proj": "attn.q", "self_attn.k_proj": "attn.k",
        "self_attn.v_proj": "attn.v", "self_attn.o_proj": "attn.o",
        "mlp.experts.{e}.gate_proj": "moe.experts.{e}.gate",
        "mlp.experts.{e}.up_proj": "moe.experts.{e}.up",
        "mlp.experts.{e}.down_proj": "moe.experts.{e}.down",
    },
))


# --------------------------------------------------------------------- gemma3
def _gemma3_config(hf: Dict[str, Any]) -> ModelConfig:
    """Gemma3 (text): gemma2's sandwich norms without the softcaps, per-head
    (1+w) q/k RMSNorms, a 5:1 sliding:full layer pattern, and DUAL rope —
    sliding layers at rope_local_base_freq unscaled, full layers at
    rope_theta with optional linear rope_scaling (HF modeling_gemma3.py
    rotary_emb vs rotary_emb_local)."""
    base = _llama_config(hf)
    import dataclasses as _dc
    pattern = hf.get("sliding_window_pattern", 6)
    layer_types = hf.get("layer_types") or tuple(
        "sliding_attention" if (i + 1) % pattern else "full_attention"
        for i in range(hf["num_hidden_layers"]))
    return _dc.replace(
        base,
        model_type="gemma3_text",
        head_dim=hf.get("head_dim", 256),
        rms_offset=1.0,
        embed_scale=hf["hidden_size"] ** 0.5,
        act=hf.get("hidden_activation") or hf.get("hidden_act",
                                                  "gelu_pytorch_tanh"),
        tie_word_embeddings=True,
        sandwich_norm=True,
        qk_norm=True,
        attn_scale=hf.get("query_pre_attn_scalar", 256) ** -0.5,
        attn_softcap=hf.get("attn_logit_softcapping"),
        logit_softcap=hf.get("final_logit_softcapping"),
        sliding_window=hf.get("sliding_window", 4096),
        layer_types=tuple(layer_types),
        rope_theta=hf.get("rope_theta", 1_000_000.0),
        rope_local_theta=hf.get("rope_local_base_freq", 10_000.0),
    )


GEMMA3_NAME_MAP = dict(GEMMA2_NAME_MAP)
GEMMA3_NAME_MAP.update({
    "layers.{i}.attn.q_norm.weight": "model.layers.{i}.self_attn.q_norm.weight",
    "layers.{i}.attn.k_norm.weight": "model.layers.{i}.self_attn.k_norm.weight",
})

for _mt in ("gemma3_text", "gemma3"):
    register(ArchSpec(
        model_type=_mt,
        make_config=_gemma3_config,
        name_map=GEMMA3_NAME_MAP,
        layer_modules=LLAMA_LAYER_MODULES,
        module_slots=LLAMA_SLOTS,
    ))


# ------------------------------------------------------------ deepseek v2/v3
def _deepseek_common(hf: Dict[str, Any], model_type: str) -> ModelConfig:
    heads = hf["num_attention_heads"]
    nope = hf.get("qk_nope_head_dim", 128)
    rd = hf.get("qk_rope_head_dim", 64)
    return ModelConfig(
        model_type=model_type,
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=heads,
        num_key_value_heads=heads,
        head_dim=nope + rd,
        max_position_embeddings=hf.get("max_position_embeddings", 4096),
        norm="rmsnorm",
        norm_eps=hf.get("rms_norm_eps", 1e-6),
        act=hf.get("hidden_act", "silu"),
        gated_mlp=True,
        pos="rope",
        rope_theta=hf.get("rope_theta", 10000.0),
        rotary_dim=rd,
        rope_interleaved=True,
        attn_scale=(nope + rd) ** -0.5,
        attn_bias=hf.get("attention_bias", False),
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
        mla=True,
        q_lora_rank=hf.get("q_lora_rank"),
        kv_lora_rank=hf.get("kv_lora_rank", 512),
        qk_nope_head_dim=nope,
        qk_rope_head_dim=rd,
        v_head_dim=hf.get("v_head_dim", 128),
        num_experts=hf.get("n_routed_experts") or 0,
        num_experts_per_tok=hf.get("num_experts_per_tok") or 6,
        moe_norm_topk=hf.get("norm_topk_prob", False),
        moe_n_group=hf.get("n_group") or 1,
        moe_topk_group=hf.get("topk_group") or 1,
        moe_routed_scale=hf.get("routed_scaling_factor", 1.0),
    )


def _deepseek_v2_config(hf: Dict[str, Any]) -> ModelConfig:
    """DeepSeek-V2: MLA attention (low-rank q/kv bottlenecks, rope/nope head
    split, complex-multiply rope = interleaved pairs) + fine-grained MoE
    with softmax scores, optional group-limited greedy top-k, ungated shared
    experts, and dense layers below first_k_dense_replace."""
    base = _deepseek_common(hf, "deepseek_v2")
    import dataclasses as _dc
    return _dc.replace(
        base,
        moe_scoring="softmax",
        moe_topk_method=hf.get("topk_method", "greedy"),
    )


def _deepseek_v3_config(hf: Dict[str, Any]) -> ModelConfig:
    """DeepSeek-V3/R1: v2's MLA plus sigmoid routing with the
    e_score_correction_bias used for selection only (noaux_tc group top-k =
    sum of each group's top-2) and renormalized top-k weights."""
    base = _deepseek_common(hf, "deepseek_v3")
    import dataclasses as _dc
    return _dc.replace(
        base,
        moe_scoring="sigmoid",
        moe_topk_method="noaux_tc",
        moe_norm_topk=hf.get("norm_topk_prob", True),
    )


DEEPSEEK_NAME_MAP = {
    "embed_tokens.weight": "model.embed_tokens.weight",
    "final_norm.weight": "model.norm.weight",
    "lm_head.weight": "lm_head.weight",
    "layers.{i}.input_norm.weight": "model.layers.{i}.input_layernorm.weight",
    "layers.{i}.post_norm.weight":
        "model.layers.{i}.post_attention_layernorm.weight",
    "layers.{i}.attn.q.weight": "model.layers.{i}.self_attn.q_proj.weight",
    "layers.{i}.attn.q_a.weight": "model.layers.{i}.self_attn.q_a_proj.weight",
    "layers.{i}.attn.q_a.bias": "model.layers.{i}.self_attn.q_a_proj.bias",
    "layers.{i}.attn.q_a_norm.weight":
        "model.layers.{i}.self_attn.q_a_layernorm.weight",
    "layers.{i}.attn.q_b.weight": "model.layers.{i}.self_attn.q_b_proj.weight",
    "layers.{i}.attn.kv_a.weight":
        "model.layers.{i}.self_attn.kv_a_proj_with_mqa.weight",
    "layers.{i}.attn.kv_a.bias":
        "model.layers.{i}.self_attn.kv_a_proj_with_mqa.bias",
    "layers.{i}.attn.kv_a_norm.weight":
        "model.layers.{i}.self_attn.kv_a_layernorm.weight",
    "layers.{i}.attn.kv_b.weight":
        "model.layers.{i}.self_attn.kv_b_proj.weight",
    "layers.{i}.attn.o.weight": "model.layers.{i}.self_attn.o_proj.weight",
    # dense layers (below first_k_dense_replace)
    "layers.{i}.mlp.gate.weight": "model.layers.{i}.mlp.gate_proj.weight",
    "layers.{i}.mlp.up.weight": "model.layers.{i}.mlp.up_proj.weight",
    "layers.{i}.mlp.down.weight": "model.layers.{i}.mlp.down_proj.weight",
    # MoE layers
    "layers.{i}.moe.router.weight": "model.layers.{i}.mlp.gate.weight",
    "layers.{i}.moe.router_bias.weight":
        "model.layers.{i}.mlp.gate.e_score_correction_bias",
    "layers.{i}.moe.experts.{e}.gate.weight":
        "model.layers.{i}.mlp.experts.{e}.gate_proj.weight",
    "layers.{i}.moe.experts.{e}.up.weight":
        "model.layers.{i}.mlp.experts.{e}.up_proj.weight",
    "layers.{i}.moe.experts.{e}.down.weight":
        "model.layers.{i}.mlp.experts.{e}.down_proj.weight",
    "layers.{i}.moe.shared.gate.weight":
        "model.layers.{i}.mlp.shared_experts.gate_proj.weight",
    "layers.{i}.moe.shared.up.weight":
        "model.layers.{i}.mlp.shared_experts.up_proj.weight",
    "layers.{i}.moe.shared.down.weight":
        "model.layers.{i}.mlp.shared_experts.down_proj.weight",
}

DEEPSEEK_LAYER_MODULES = [
    ["self_attn.q_proj", "self_attn.q_a_proj",
     "self_attn.kv_a_proj_with_mqa"],
    ["self_attn.q_b_proj", "self_attn.kv_b_proj"],
    ["self_attn.o_proj"],
    ["mlp.gate_proj", "mlp.up_proj",
     "mlp.shared_experts.gate_proj", "mlp.shared_experts.up_proj",
     "mlp.experts.{e}.gate_proj", "mlp.experts.{e}.up_proj"],
    ["mlp.down_proj", "mlp.shared_experts.down_proj",
     "mlp.experts.{e}.down_proj"],
]

DEEPSEEK_SLOTS = {
    "self_attn.q_proj": "attn.q",
    "self_attn.q_a_proj": "attn.q_a",
    "self_attn.q_b_proj": "attn.q_b",
    "self_attn.kv_a_proj_with_mqa": "attn.kv_a",
    "self_attn.kv_b_proj": "attn.kv_b",
    "self_attn.o_proj": "attn.o",
    "mlp.gate_proj": "mlp.gate", "mlp.up_proj": "mlp.up",
    "mlp.down_proj": "mlp.down",
    "mlp.experts.{e}.gate_proj": "moe.experts.{e}.gate",
    "mlp.experts.{e}.up_proj": "moe.experts.{e}.up",
    "mlp.experts.{e}.down_proj": "moe.experts.{e}.down",
    "mlp.shared_experts.gate_proj": "moe.shared.gate",
    "mlp.shared_experts.up_proj": "moe.shared.up",
    "mlp.shared_experts.down_proj": "moe.shared.down",
}

register(ArchSpec(
    model_type="deepseek_v2",
    make_config=_deepseek_v2_config,
    name_map=DEEPSEEK_NAME_MAP,
    layer_modules=DEEPSEEK_LAYER_MODULES,
    module_slots=DEEPSEEK_SLOTS,
))

register(ArchSpec(
    model_type="deepseek_v3",
    make_config=_deepseek_v3_config,
    name_map=DEEPSEEK_NAME_MAP,
    layer_modules=DEEPSEEK_LAYER_MODULES,
    module_slots=DEEPSEEK_SLOTS,
))


# ----------------------------------------------------------------------- dbrx
def _dbrx_config(hf: Dict[str, Any]) -> ModelConfig:
    """DBRX: fused clipped Wqkv with GQA, bias-free LayerNorms, and a 16-way
    MoE whose experts live in three fused [E*ffn, h] tensors (w1=gate,
    v1=up, w2=down-transposed) — split to per-expert linears at import.
    Router: softmax -> top-k -> p-norm renormalize (p=1 == sum renorm)."""
    attn = hf.get("attn_config") or {}
    ffn = hf.get("ffn_config") or {}
    p = ffn.get("moe_normalize_expert_weights", 1.0)
    if p not in (None, 1, 1.0):
        raise NotImplementedError(f"dbrx moe_normalize_expert_weights={p}")
    h = hf["d_model"]
    heads = hf["n_heads"]
    return ModelConfig(
        model_type="dbrx",
        vocab_size=hf["vocab_size"],
        hidden_size=h,
        intermediate_size=ffn.get("ffn_hidden_size", 4 * h),
        num_hidden_layers=hf["n_layers"],
        num_attention_heads=heads,
        num_key_value_heads=attn.get("kv_n_heads", 1),
        head_dim=h // heads,
        max_position_embeddings=hf.get("max_seq_len", 2048),
        norm="layernorm",
        norm_eps=1e-5,
        act=(ffn.get("ffn_act_fn") or {}).get("name", "silu"),
        gated_mlp=True,
        pos="rope",
        rope_theta=attn.get("rope_theta", 10000.0),
        clip_qkv=attn.get("clip_qkv"),
        attn_bias=False,
        mlp_bias=False,
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
        num_experts=ffn.get("moe_num_experts", 16),
        num_experts_per_tok=ffn.get("moe_top_k", 4),
        moe_norm_topk=p is not None,
    )


def _dbrx_convert_state(state: Dict[str, Any], hf: Dict[str, Any]) -> Dict[str, Any]:
    """Split Wqkv ([q; k; v] rows) and the fused expert tensors, flatten the
    norm_attn_norm nesting."""
    import numpy as _np
    attn = hf.get("attn_config") or {}
    ffn = hf.get("ffn_config") or {}
    h = hf["d_model"]
    heads = hf["n_heads"]
    hd = h // heads
    kvd = attn.get("kv_n_heads", 1) * hd
    E = ffn.get("moe_num_experts", 16)
    inter = ffn.get("ffn_hidden_size", 4 * h)
    out: Dict[str, Any] = {}
    for k, v in state.items():
        v = _np.asarray(v)
        if ".attn.Wqkv." in k:
            base = k.replace("norm_attn_norm.attn.Wqkv", "attn.{}")
            out[base.format("q_proj")] = _np.ascontiguousarray(v[:h])
            out[base.format("k_proj")] = _np.ascontiguousarray(v[h:h + kvd])
            out[base.format("v_proj")] = _np.ascontiguousarray(v[h + kvd:])
        elif ".norm_attn_norm." in k:
            out[k.replace("norm_attn_norm.", "")] = v
        elif k.endswith(".ffn.experts.mlp.w1") or k.endswith(".ffn.experts.mlp.v1"):
            name = "w1" if k.endswith("w1") else "v1"
            w = v.reshape(E, inter, h)
            for e in range(E):
                out[k.replace(f"experts.mlp.{name}",
                              f"experts.{e}.{name}.weight")] = \
                    _np.ascontiguousarray(w[e])
        elif k.endswith(".ffn.experts.mlp.w2"):
            # used untransposed in HF forward: down weight is w2_e^T
            w = v.reshape(E, inter, h)
            for e in range(E):
                out[k.replace("experts.mlp.w2",
                              f"experts.{e}.w2.weight")] = \
                    _np.ascontiguousarray(w[e].T)
        else:
            out[k] = v
    return out


DBRX_NAME_MAP = {
    "embed_tokens.weight": "transformer.wte.weight",
    "final_norm.weight": "transformer.norm_f.weight",
    "lm_head.weight": "lm_head.weight",
    "layers.{i}.input_norm.weight": "transformer.blocks.{i}.norm_1.weight",
    "layers.{i}.post_norm.weight": "transformer.blocks.{i}.norm_2.weight",
    "layers.{i}.attn.q.weight": "transformer.blocks.{i}.attn.q_proj.weight",
    "layers.{i}.attn.k.weight": "transformer.blocks.{i}.attn.k_proj.weight",
    "layers.{i}.attn.v.weight": "transformer.blocks.{i}.attn.v_proj.weight",
    "layers.{i}.attn.o.weight": "transformer.blocks.{i}.attn.out_proj.weight",
    "layers.{i}.moe.router.weight": "transformer.blocks.{i}.ffn.router.layer.weight",
    "layers.{i}.moe.experts.{e}.gate.weight":
        "transformer.blocks.{i}.ffn.experts.{e}.w1.weight",
    "layers.{i}.moe.experts.{e}.up.weight":
        "transformer.blocks.{i}.ffn.experts.{e}.v1.weight",
    "layers.{i}.moe.experts.{e}.down.weight":
        "transformer.blocks.{i}.ffn.experts.{e}.w2.weight",
}

register(ArchSpec(
    model_type="dbrx",
    make_config=_dbrx_config,
    convert_state=_dbrx_convert_state,
    name_map=DBRX_NAME_MAP,
    layer_modules=[
        ["attn.q_proj", "attn.k_proj", "attn.v_proj"],
        ["attn.out_proj"],
        ["ffn.experts.{e}.w1", "ffn.experts.{e}.v1"],
        ["ffn.experts.{e}.w2"],
    ],
    module_slots={
        "attn.q_proj": "attn.q", "attn.k_proj": "attn.k",
        "attn.v_proj": "attn.v", "attn.out_proj": "attn.o",
        "ffn.experts.{e}.w1": "moe.experts.{e}.gate",
        "ffn.experts.{e}.v1": "moe.experts.{e}.up",
        "ffn.experts.{e}.w2": "moe.experts.{e}.down",
    },
    layers_prefix="transformer.blocks",
))


# -------------------------------------------------------------------- nemotron
def _nemotron_config(hf: Dict[str, Any]) -> ModelConfig:
    """Nemotron: LayerNorm1P (weight stored as w-1, like gemma's rmsnorm
    offset but for LayerNorm with bias), squared-ReLU ungated MLP, partial
    half-split rotary."""
    heads = hf["num_attention_heads"]
    hd = hf.get("head_dim") or hf["hidden_size"] // heads
    return ModelConfig(
        model_type="nemotron",
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=heads,
        num_key_value_heads=hf.get("num_key_value_heads") or heads,
        head_dim=hd,
        max_position_embeddings=hf.get("max_position_embeddings", 4096),
        norm="layernorm",
        norm_eps=hf.get("norm_eps", 1e-5),
        rms_offset=1.0,
        act=hf.get("hidden_act", "relu2"),
        gated_mlp=False,
        pos="rope",
        rope_theta=hf.get("rope_theta", 10000.0),
        rotary_dim=int(hd * hf.get("partial_rotary_factor", 0.5)),
        attn_bias=hf.get("attention_bias", False),
        mlp_bias=hf.get("mlp_bias", False),
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
    )


NEMOTRON_NAME_MAP = {
    "embed_tokens.weight": "model.embed_tokens.weight",
    "final_norm.weight": "model.norm.weight",
    "final_norm.bias": "model.norm.bias",
    "lm_head.weight": "lm_head.weight",
    "layers.{i}.input_norm.weight": "model.layers.{i}.input_layernorm.weight",
    "layers.{i}.input_norm.bias": "model.layers.{i}.input_layernorm.bias",
    "layers.{i}.post_norm.weight":
        "model.layers.{i}.post_attention_layernorm.weight",
    "layers.{i}.post_norm.bias":
        "model.layers.{i}.post_attention_layernorm.bias",
    "layers.{i}.attn.q.weight": "model.layers.{i}.self_attn.q_proj.weight",
    "layers.{i}.attn.k.weight": "model.layers.{i}.self_attn.k_proj.weight",
    "layers.{i}.attn.v.weight": "model.layers.{i}.self_attn.v_proj.weight",
    "layers.{i}.attn.o.weight": "model.layers.{i}.self_attn.o_proj.weight",
    "layers.{i}.mlp.up.weight": "model.layers.{i}.mlp.up_proj.weight",
    "layers.{i}.mlp.down.weight": "model.layers.{i}.mlp.down_proj.weight",
}

register(ArchSpec(
    model_type="nemotron",
    make_config=_nemotron_config,
    name_map=NEMOTRON_NAME_MAP,
    layer_modules=[
        ["self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"],
        ["self_attn.o_proj"],
        ["mlp.up_proj"],
        ["mlp.down_proj"],
    ],
    module_slots={
        "self_attn.q_proj": "attn.q", "self_attn.k_proj": "attn.k",
        "self_attn.v_proj": "attn.v", "self_attn.o_proj": "attn.o",
        "mlp.up_proj": "mlp.up", "mlp.down_proj": "mlp.down",
    },
))


# -------------------------------------------------------------------- exaone4
def _exaone4_config(hf: Dict[str, Any]) -> ModelConfig:
    """EXAONE-4.0: olmo2-style post-sublayer norms, per-head q/k RMSNorms,
    hybrid attention — 3:1 sliding:full layers where FULL layers use global
    NoPE (no rotation; modeling_exaone4.py:226-227) and sliding layers
    rotate normally."""
    base = _llama_config(hf)
    import dataclasses as _dc
    sw = hf.get("sliding_window")
    layer_types = hf.get("layer_types")
    if sw and not layer_types:
        pat = hf.get("sliding_window_pattern", 4)
        layer_types = tuple(
            "sliding_attention" if (i + 1) % pat else "full_attention"
            for i in range(hf["num_hidden_layers"]))
    return _dc.replace(
        base, model_type="exaone4",
        qk_norm=True,
        norm_after_sublayer=True,
        sliding_window=sw,
        layer_types=tuple(layer_types) if layer_types else None,
        rope_nope_full=sw is not None,
    )


EXAONE4_NAME_MAP = dict(OLMO2_NAME_MAP)

register(ArchSpec(
    model_type="exaone4",
    make_config=_exaone4_config,
    name_map=EXAONE4_NAME_MAP,
    layer_modules=LLAMA_LAYER_MODULES,
    module_slots=LLAMA_SLOTS,
))


# --------------------------------------------------------------------- phimoe
def _phimoe_config(hf: Dict[str, Any]) -> ModelConfig:
    """Phi-3.5-MoE: mixtral-shaped 16-expert MoE but with LayerNorm (bias)
    norms, optional attention/lm_head biases, and SPARSEMIXER routing —
    per-expert masked softmaxes with a relative jitter threshold instead of
    one softmax + renormalized top-k (modeling_phimoe.py:605-730, inference
    branch). router_jitter_noise doubles as the inference threshold eps."""
    if hf.get("rope_scaling"):
        raise NotImplementedError("phimoe longrope scaling not modeled")
    heads = hf["num_attention_heads"]
    return ModelConfig(
        model_type="phimoe",
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=heads,
        num_key_value_heads=hf.get("num_key_value_heads") or heads,
        head_dim=hf.get("head_dim") or hf["hidden_size"] // heads,
        max_position_embeddings=hf.get("max_position_embeddings", 4096),
        norm="layernorm",
        norm_eps=hf.get("rms_norm_eps", 1e-5),
        act=hf.get("hidden_act", "silu"),
        gated_mlp=True,
        pos="rope",
        rope_theta=hf.get("rope_theta", 1e6),
        attn_bias=hf.get("attention_bias", False),
        mlp_bias=False,
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
        sliding_window=hf.get("sliding_window"),
        num_experts=hf.get("num_local_experts", 16),
        num_experts_per_tok=hf.get("num_experts_per_tok", 2),
        moe_router_mode="sparsemixer",
        router_jitter_eps=hf.get("router_jitter_noise", 0.01),
    )


PHIMOE_NAME_MAP = {
    "embed_tokens.weight": "model.embed_tokens.weight",
    "final_norm.weight": "model.norm.weight",
    "final_norm.bias": "model.norm.bias",
    "lm_head.weight": "lm_head.weight",
    "lm_head.bias": "lm_head.bias",
    "layers.{i}.input_norm.weight": "model.layers.{i}.input_layernorm.weight",
    "layers.{i}.input_norm.bias": "model.layers.{i}.input_layernorm.bias",
    "layers.{i}.post_norm.weight":
        "model.layers.{i}.post_attention_layernorm.weight",
    "layers.{i}.post_norm.bias":
        "model.layers.{i}.post_attention_layernorm.bias",
    "layers.{i}.attn.q.weight": "model.layers.{i}.self_attn.q_proj.weight",
    "layers.{i}.attn.k.weight": "model.layers.{i}.self_attn.k_proj.weight",
    "layers.{i}.attn.v.weight": "model.layers.{i}.self_attn.v_proj.weight",
    "layers.{i}.attn.o.weight": "model.layers.{i}.self_attn.o_proj.weight",
    "layers.{i}.attn.q.bias": "model.layers.{i}.self_attn.q_proj.bias",
    "layers.{i}.attn.k.bias": "model.layers.{i}.self_attn.k_proj.bias",
    "layers.{i}.attn.v.bias": "model.layers.{i}.self_attn.v_proj.bias",
    "layers.{i}.attn.o.bias": "model.layers.{i}.self_attn.o_proj.bias",
    "layers.{i}.moe.router.weight":
        "model.layers.{i}.block_sparse_moe.gate.weight",
    "layers.{i}.moe.experts.{e}.gate.weight":
        "model.layers.{i}.block_sparse_moe.experts.{e}.w1.weight",
    "layers.{i}.moe.experts.{e}.down.weight":
        "model.layers.{i}.block_sparse_moe.experts.{e}.w2.weight",
    "layers.{i}.moe.experts.{e}.up.weight":
        "model.layers.{i}.block_sparse_moe.experts.{e}.w3.weight",
}

register(ArchSpec(
    model_type="phimoe",
    make_config=_phimoe_config,
    name_map=PHIMOE_NAME_MAP,
    layer_modules=MIXTRAL_LAYER_MODULES,
    module_slots=MIXTRAL_SLOTS,
))


# -------------------------------------------------------------------- cohere2
def _cohere2_config(hf: Dict[str, Any]) -> ModelConfig:
    """Cohere command-r7b: cohere v1 parallel-residual structure (shared
    input norm, interleaved rotary, logit_scale, tied embeddings) plus
    hybrid attention — sliding layers rotate, full layers are global NoPE
    (modeling_cohere2.py:217-218 applies rope only when sliding)."""
    import dataclasses as _dc
    base = _cohere_config(hf)
    sw = hf.get("sliding_window")
    lt = hf.get("layer_types")
    if sw and not lt:
        pat = hf.get("sliding_window_pattern", 4)
        lt = tuple("sliding_attention" if (i + 1) % pat else "full_attention"
                   for i in range(hf["num_hidden_layers"]))
    return _dc.replace(
        base, model_type="cohere2",
        sliding_window=sw,
        layer_types=tuple(lt) if lt else None,
        rope_nope_full=sw is not None,
    )


register(ArchSpec(
    model_type="cohere2",
    make_config=_cohere2_config,
    convert_state=lambda s, hf: _dup_shared_norm(
        s, "input_layernorm", "ln_parallel"),
    name_map=COHERE_NAME_MAP,
    layer_modules=LLAMA_LAYER_MODULES,
    module_slots=LLAMA_SLOTS,
))


# ---------------------------------------------------- remote-code llama family
# Architectures whose HF repos ship custom modeling code (no transformers
# class in this environment). Their module structure maps exactly onto
# already-oracle-tested ModelConfig knobs; what each spec contributes is the
# config translation + tensor-layout conversion (fused splits), which the
# tests validate by fusing a local oracle model's weights into the foreign
# layout and checking logits parity through our importer.

def _baichuan_config(hf: Dict[str, Any]) -> ModelConfig:
    """Baichuan 1/2 (modeling_baichuan.py, remote code): llama decoder with a
    fused W_pack qkv. 7B (hidden 4096) uses rope; 13B (hidden 5120) uses
    ALiBi with bloom-style slopes and no rotary (the two releases ship
    different modeling files; config carries no flag, so we key on the only
    structural difference, hidden_size). Baichuan2's NormHead (row-normalized
    lm_head at inference) is applied at import time (see convert_state)."""
    import dataclasses as _dc
    base = _llama_config(hf)
    alibi = hf["hidden_size"] >= 5120 and hf.get("position_embedding", "") != "rope"
    return _dc.replace(
        base, model_type="baichuan",
        pos="alibi" if alibi else "rope",
        norm_eps=hf.get("rms_norm_eps", 1e-6),
    )


def _baichuan_convert_state(state: Dict[str, Any], hf: Dict[str, Any]) -> Dict[str, Any]:
    """Split W_pack rows [q; k; v] and, for Baichuan2 (vocab >= 125696 —
    v1 is 64000), L2-normalize lm_head rows (NormHead inference semantics:
    F.normalize(weight) in the v2 modeling code)."""
    import numpy as _np

    h = hf["hidden_size"]
    out: Dict[str, Any] = {}
    for k, v in state.items():
        v = _np.asarray(v)
        if ".self_attn.W_pack." in k:
            base = k.replace("W_pack", "{}")
            out[base.format("q_proj")] = _np.ascontiguousarray(v[:h])
            out[base.format("k_proj")] = _np.ascontiguousarray(v[h:2 * h])
            out[base.format("v_proj")] = _np.ascontiguousarray(v[2 * h:])
        elif k == "lm_head.weight" and hf["vocab_size"] >= 125696:
            nrm = _np.linalg.norm(v.astype(_np.float32), axis=1, keepdims=True)
            out[k] = (v / _np.maximum(nrm, 1e-12)).astype(v.dtype)
        else:
            out[k] = v
    return out


register(ArchSpec(
    model_type="baichuan",
    make_config=_baichuan_config,
    convert_state=_baichuan_convert_state,
    name_map=LLAMA_NAME_MAP,
    layer_modules=LLAMA_LAYER_MODULES,
    module_slots=LLAMA_SLOTS,
))


def _internlm_config(hf: Dict[str, Any]) -> ModelConfig:
    """InternLM v1 (modeling_internlm.py): llama with optional q/k/v/o biases
    (config.bias); tensor names are llama's."""
    import dataclasses as _dc
    return _dc.replace(_llama_config(hf), model_type="internlm",
                       attn_bias=hf.get("bias", True))


INTERNLM_NAME_MAP = dict(LLAMA_NAME_MAP)
INTERNLM_NAME_MAP["layers.{i}.attn.o.bias"] = \
    "model.layers.{i}.self_attn.o_proj.bias"

register(ArchSpec(
    model_type="internlm",
    make_config=_internlm_config,
    name_map=INTERNLM_NAME_MAP,
    layer_modules=LLAMA_LAYER_MODULES,
    module_slots=LLAMA_SLOTS,
))


def _internlm2_config(hf: Dict[str, Any]) -> ModelConfig:
    import dataclasses as _dc
    return _dc.replace(_llama_config(hf), model_type="internlm2",
                       attn_bias=hf.get("bias", False))


def _internlm2_convert_state(state: Dict[str, Any], hf: Dict[str, Any]) -> Dict[str, Any]:
    """Split internlm2's grouped wqkv (modeling_internlm2.py: reshape to
    [kv_heads, q_per_group + 2, head_dim, hidden]; the first q_per_group
    blocks of each group are that group's q heads, then its k, then its v)
    into plain q/k/v projections."""
    import numpy as _np

    heads = hf["num_attention_heads"]
    kv = hf.get("num_key_value_heads", heads)
    hd = hf.get("head_dim") or hf["hidden_size"] // heads
    qpg = heads // kv
    out: Dict[str, Any] = {}
    for k, v in state.items():
        v = _np.asarray(v)
        if ".attention.wqkv." in k:
            base = k.replace("wqkv", "{}")
            w = v.reshape(kv, qpg + 2, hd, -1)
            out[base.format("wq")] = _np.ascontiguousarray(
                w[:, :qpg].reshape(heads * hd, -1))
            out[base.format("wk")] = _np.ascontiguousarray(
                w[:, qpg].reshape(kv * hd, -1))
            out[base.format("wv")] = _np.ascontiguousarray(
                w[:, qpg + 1].reshape(kv * hd, -1))
        else:
            out[k] = v
    return out


INTERNLM2_NAME_MAP = {
    "embed_tokens.weight": "model.tok_embeddings.weight",
    "final_norm.weight": "model.norm.weight",
    "lm_head.weight": "output.weight",
    "layers.{i}.input_norm.weight": "model.layers.{i}.attention_norm.weight",
    "layers.{i}.post_norm.weight": "model.layers.{i}.ffn_norm.weight",
    "layers.{i}.attn.q.weight": "model.layers.{i}.attention.wq.weight",
    "layers.{i}.attn.k.weight": "model.layers.{i}.attention.wk.weight",
    "layers.{i}.attn.v.weight": "model.layers.{i}.attention.wv.weight",
    "layers.{i}.attn.o.weight": "model.layers.{i}.attention.wo.weight",
    "layers.{i}.mlp.gate.weight": "model.layers.{i}.feed_forward.w1.weight",
    "layers.{i}.mlp.up.weight": "model.layers.{i}.feed_forward.w3.weight",
    "layers.{i}.mlp.down.weight": "model.layers.{i}.feed_forward.w2.weight",
}

register(ArchSpec(
    model_type="internlm2",
    make_config=_internlm2_config,
    convert_state=_internlm2_convert_state,
    name_map=INTERNLM2_NAME_MAP,
    layer_modules=[
        ["attention.wq", "attention.wk", "attention.wv"],
        ["attention.wo"],
        ["feed_forward.w1", "feed_forward.w3"],
        ["feed_forward.w2"],
    ],
    module_slots={
        "attention.wq": "attn.q", "attention.wk": "attn.k",
        "attention.wv": "attn.v", "attention.wo": "attn.o",
        "feed_forward.w1": "mlp.gate", "feed_forward.w3": "mlp.up",
        "feed_forward.w2": "mlp.down",
    },
))


def _xverse_config(hf: Dict[str, Any]) -> ModelConfig:
    import dataclasses as _dc
    return _dc.replace(_llama_config(hf), model_type="xverse")


register(ArchSpec(  # llama-identical naming and forward (modeling_xverse.py)
    model_type="xverse",
    make_config=_xverse_config,
    name_map=LLAMA_NAME_MAP,
    layer_modules=LLAMA_LAYER_MODULES,
    module_slots=LLAMA_SLOTS,
))


def _longllama_config(hf: Dict[str, Any]) -> ModelConfig:
    """LongLLaMA: llama forward within the local context window; the FoT
    memory-layer retrieval machinery (mem_layers, beyond last_context_length)
    is not modeled — quantization and in-context serving use the plain llama
    path, matching the reference which quantizes only the llama projections
    (definitions/longllama.py)."""
    import dataclasses as _dc
    return _dc.replace(_llama_config(hf), model_type="longllama")


register(ArchSpec(
    model_type="longllama",
    make_config=_longllama_config,
    name_map=LLAMA_NAME_MAP,
    layer_modules=LLAMA_LAYER_MODULES,
    module_slots=LLAMA_SLOTS,
))


def _qwen_config(hf: Dict[str, Any]) -> ModelConfig:
    """Qwen v1 (modeling_qwen.py, remote code): RMSNorm, neox-style rope at
    config.rotary_emb_base, fused c_attn with bias (other Linears follow
    no_bias=True), and a halved MLP: w1/w2 each project to
    intermediate_size // 2 with out = c_proj(w1(x) * silu(w2(x))) — so
    gate = w2, up = w1 at half the declared intermediate width. The
    beyond-training-length machinery (dynamic NTK, logn attention scaling)
    is inactive inside seq_length and is not modeled."""
    heads = hf["num_attention_heads"]
    return ModelConfig(
        model_type="qwen",
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"] // 2,
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=heads,
        num_key_value_heads=heads,
        head_dim=hf.get("kv_channels") or hf["hidden_size"] // heads,
        max_position_embeddings=hf.get("max_position_embeddings",
                                       hf.get("seq_length", 8192)),
        norm="rmsnorm",
        norm_eps=hf.get("layer_norm_epsilon", 1e-6),
        act="silu",
        gated_mlp=True,
        pos="rope",
        rope_theta=hf.get("rotary_emb_base", 10000.0),
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
    )


def _qwen_convert_state(state: Dict[str, Any], hf: Dict[str, Any]) -> Dict[str, Any]:
    """Split the fused c_attn ([q; k; v] rows, bias included)."""
    import numpy as _np

    h = hf["hidden_size"]
    out: Dict[str, Any] = {}
    for k, v in state.items():
        v = _np.asarray(v)
        if ".attn.c_attn." in k:
            base = k.replace("c_attn", "{}")
            out[base.format("q_attn")] = _np.ascontiguousarray(v[:h])
            out[base.format("k_attn")] = _np.ascontiguousarray(v[h:2 * h])
            out[base.format("v_attn")] = _np.ascontiguousarray(v[2 * h:])
        else:
            out[k] = v
    return out


QWEN_NAME_MAP = {
    "embed_tokens.weight": "transformer.wte.weight",
    "final_norm.weight": "transformer.ln_f.weight",
    "lm_head.weight": "lm_head.weight",
    "layers.{i}.input_norm.weight": "transformer.h.{i}.ln_1.weight",
    "layers.{i}.post_norm.weight": "transformer.h.{i}.ln_2.weight",
    "layers.{i}.attn.q.weight": "transformer.h.{i}.attn.q_attn.weight",
    "layers.{i}.attn.k.weight": "transformer.h.{i}.attn.k_attn.weight",
    "layers.{i}.attn.v.weight": "transformer.h.{i}.attn.v_attn.weight",
    "layers.{i}.attn.q.bias": "transformer.h.{i}.attn.q_attn.bias",
    "layers.{i}.attn.k.bias": "transformer.h.{i}.attn.k_attn.bias",
    "layers.{i}.attn.v.bias": "transformer.h.{i}.attn.v_attn.bias",
    "layers.{i}.attn.o.weight": "transformer.h.{i}.attn.c_proj.weight",
    "layers.{i}.mlp.up.weight": "transformer.h.{i}.mlp.w1.weight",
    "layers.{i}.mlp.gate.weight": "transformer.h.{i}.mlp.w2.weight",
    "layers.{i}.mlp.down.weight": "transformer.h.{i}.mlp.c_proj.weight",
}

register(ArchSpec(
    model_type="qwen",
    make_config=_qwen_config,
    convert_state=_qwen_convert_state,
    name_map=QWEN_NAME_MAP,
    layer_modules=[
        ["attn.q_attn", "attn.k_attn", "attn.v_attn"],
        ["attn.c_proj"],
        ["mlp.w1", "mlp.w2"],
        ["mlp.c_proj"],
    ],
    module_slots={
        "attn.q_attn": "attn.q", "attn.k_attn": "attn.k",
        "attn.v_attn": "attn.v", "attn.c_proj": "attn.o",
        "mlp.w1": "mlp.up", "mlp.w2": "mlp.gate",
        "mlp.c_proj": "mlp.down",
    },
    layers_prefix="transformer.h",
))


def _exaone_config(hf: Dict[str, Any]) -> ModelConfig:
    """EXAONE 3.x (modeling_exaone.py, remote code): llama forward under
    gpt-style names — transformer.h.{i}.ln_1/ln_2 RMSNorms,
    attn.attention.{q,k,v,out}_proj, mlp c_fc_0 (gate) / c_fc_1 (up) /
    c_proj (down); config uses num_layers + activation_function."""
    heads = hf["num_attention_heads"]
    return ModelConfig(
        model_type="exaone",
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_hidden_layers=hf["num_layers"],
        num_attention_heads=heads,
        num_key_value_heads=hf.get("num_key_value_heads") or heads,
        head_dim=hf.get("head_dim") or hf["hidden_size"] // heads,
        max_position_embeddings=hf.get("max_position_embeddings", 4096),
        norm="rmsnorm",
        norm_eps=hf.get("layer_norm_epsilon", 1e-5),
        act=hf.get("activation_function", "silu"),
        gated_mlp=True,
        pos="rope",
        rope_theta=hf.get("rope_theta", 10000.0),
        rope_scaling=hf.get("rope_scaling"),
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
    )


EXAONE_NAME_MAP = {
    "embed_tokens.weight": "transformer.wte.weight",
    "final_norm.weight": "transformer.ln_f.weight",
    "lm_head.weight": "lm_head.weight",
    "layers.{i}.input_norm.weight": "transformer.h.{i}.ln_1.weight",
    "layers.{i}.post_norm.weight": "transformer.h.{i}.ln_2.weight",
    "layers.{i}.attn.q.weight": "transformer.h.{i}.attn.attention.q_proj.weight",
    "layers.{i}.attn.k.weight": "transformer.h.{i}.attn.attention.k_proj.weight",
    "layers.{i}.attn.v.weight": "transformer.h.{i}.attn.attention.v_proj.weight",
    "layers.{i}.attn.o.weight": "transformer.h.{i}.attn.attention.out_proj.weight",
    "layers.{i}.mlp.gate.weight": "transformer.h.{i}.mlp.c_fc_0.weight",
    "layers.{i}.mlp.up.weight": "transformer.h.{i}.mlp.c_fc_1.weight",
    "layers.{i}.mlp.down.weight": "transformer.h.{i}.mlp.c_proj.weight",
}

register(ArchSpec(
    model_type="exaone",
    make_config=_exaone_config,
    name_map=EXAONE_NAME_MAP,
    layer_modules=[
        ["attn.attention.q_proj", "attn.attention.k_proj",
         "attn.attention.v_proj"],
        ["attn.attention.out_proj"],
        ["mlp.c_fc_0", "mlp.c_fc_1"],
        ["mlp.c_proj"],
    ],
    module_slots={
        "attn.attention.q_proj": "attn.q", "attn.attention.k_proj": "attn.k",
        "attn.attention.v_proj": "attn.v", "attn.attention.out_proj": "attn.o",
        "mlp.c_fc_0": "mlp.gate", "mlp.c_fc_1": "mlp.up",
        "mlp.c_proj": "mlp.down",
    },
    layers_prefix="transformer.h",
))


def _stablelm_epoch_config(hf: Dict[str, Any]) -> ModelConfig:
    """StableLM-epoch (modeling_stablelm_epoch.py, remote code): the
    pre-transformers StableLM — LayerNorm(+bias) norms, partial rotary at
    rope_pct of head_dim, llama-style names; config keys norm_eps/rope_pct
    instead of layer_norm_eps/partial_rotary_factor."""
    import dataclasses as _dc
    heads = hf["num_attention_heads"]
    hd = hf["hidden_size"] // heads
    return _dc.replace(
        _llama_config(hf), model_type="stablelm_epoch",
        norm="layernorm",
        norm_eps=hf.get("norm_eps", 1e-5),
        head_dim=hd,
        rotary_dim=int(hd * hf.get("rope_pct", 0.25)),
    )


register(ArchSpec(
    model_type="stablelm_epoch",
    make_config=_stablelm_epoch_config,
    name_map=STABLELM_NAME_MAP,
    layer_modules=LLAMA_LAYER_MODULES,
    module_slots=LLAMA_SLOTS,
))


def _decilm_config(hf: Dict[str, Any]) -> ModelConfig:
    """DeciLM (modeling_decilm.py, remote code): llama with VARIABLE
    per-layer GQA — config.num_key_value_heads_per_layer. The forward infers
    each layer's kv width from its tensors; num_key_value_heads records the
    max for uniform-cache callers. Nemotron-NAS-style block_configs (ffn/
    attention elimination) are a different model type and not modeled."""
    import dataclasses as _dc
    if hf.get("block_configs"):
        raise NotImplementedError("decilm/nemotron-nas block_configs")
    per_layer = hf.get("num_key_value_heads_per_layer")
    base = _llama_config(hf)
    if per_layer:
        base = _dc.replace(base, num_key_value_heads=max(per_layer),
                           kv_heads_per_layer=tuple(per_layer))
    return _dc.replace(base, model_type="decilm")


for _mt in ("deci", "decilm"):
    register(ArchSpec(
        model_type=_mt,
        make_config=_decilm_config,
        name_map=LLAMA_NAME_MAP,
        layer_modules=LLAMA_LAYER_MODULES,
        module_slots=LLAMA_SLOTS,
    ))


def _moss_config(hf: Dict[str, Any]) -> ModelConfig:
    """MOSS (modeling_moss.py, remote code): the CodeGen architecture —
    shared-norm parallel residual, interleaved partial rotary, fused
    qkv_proj in mp_num=4 blocks — under identical tensor names."""
    import dataclasses as _dc
    return _dc.replace(_codegen_config(hf), model_type="moss")


register(ArchSpec(
    model_type="moss",
    make_config=_moss_config,
    convert_state=_codegen_convert_state,
    name_map=CODEGEN_NAME_MAP,
    layer_modules=[
        ["attn.q_proj", "attn.k_proj", "attn.v_proj"],
        ["attn.out_proj"],
        ["mlp.fc_in"],
        ["mlp.fc_out"],
    ],
    module_slots={
        "attn.q_proj": "attn.q", "attn.k_proj": "attn.k",
        "attn.v_proj": "attn.v", "attn.out_proj": "attn.o",
        "mlp.fc_in": "mlp.up", "mlp.fc_out": "mlp.down",
    },
    layers_prefix="transformer.h",
))


def _telechat2_config(hf: Dict[str, Any]) -> ModelConfig:
    """TeleChat2 (modeling_telechat2.py, remote code): llama-style RMSNorm
    decoder under bloom-lineage names — transformer.word_embeddings, per
    layer self_attention.query (no bias) + fused key_value + dense, mlp
    gate/up (no bias) and down_proj WITH bias. Rope at the default base."""
    heads = hf["num_attention_heads"]
    kv = hf.get("num_key_value_heads") or heads
    return ModelConfig(
        model_type="telechat2",
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf.get("ffn_hidden_size",
                                 hf.get("intermediate_size")),
        num_hidden_layers=hf.get("n_layer", hf.get("num_hidden_layers")),
        num_attention_heads=heads,
        num_key_value_heads=kv,
        head_dim=hf["hidden_size"] // heads,
        max_position_embeddings=hf.get("seq_length", 8192),
        norm="rmsnorm",
        norm_eps=hf.get("layer_norm_epsilon", 1e-5),
        act="silu",
        gated_mlp=True,
        pos="rope",
        rope_theta=hf.get("rotary_emb_base", 10000.0),
        tie_word_embeddings=False,
    )


def _telechat2_convert_state(state: Dict[str, Any], hf: Dict[str, Any]) -> Dict[str, Any]:
    """Split the fused key_value: modeling_telechat2.py views the projection
    as [.., kv_heads, 2*head_dim] and chunks the last dim, so the row layout
    is per-head [k_head; v_head] blocks."""
    import numpy as _np

    heads = hf["num_attention_heads"]
    kv = hf.get("num_key_value_heads") or heads
    hd = hf["hidden_size"] // heads
    out: Dict[str, Any] = {}
    for k, v in state.items():
        v = _np.asarray(v)
        if ".self_attention.key_value." in k:
            base = k.replace("key_value", "{}")
            w = v.reshape(kv, 2, hd, *v.shape[1:])
            out[base.format("key")] = _np.ascontiguousarray(
                w[:, 0].reshape(kv * hd, *v.shape[1:]))
            out[base.format("value")] = _np.ascontiguousarray(
                w[:, 1].reshape(kv * hd, *v.shape[1:]))
        else:
            out[k] = v
    return out


TELECHAT2_NAME_MAP = {
    "embed_tokens.weight": "transformer.word_embeddings.weight",
    "final_norm.weight": "transformer.ln_f.weight",
    "lm_head.weight": "lm_head.weight",
    "layers.{i}.input_norm.weight": "transformer.h.{i}.input_layernorm.weight",
    "layers.{i}.post_norm.weight":
        "transformer.h.{i}.post_attention_layernorm.weight",
    "layers.{i}.attn.q.weight": "transformer.h.{i}.self_attention.query.weight",
    "layers.{i}.attn.k.weight": "transformer.h.{i}.self_attention.key.weight",
    "layers.{i}.attn.v.weight": "transformer.h.{i}.self_attention.value.weight",
    "layers.{i}.attn.o.weight": "transformer.h.{i}.self_attention.dense.weight",
    "layers.{i}.attn.o.bias": "transformer.h.{i}.self_attention.dense.bias",
    "layers.{i}.mlp.gate.weight": "transformer.h.{i}.mlp.gate_proj.weight",
    "layers.{i}.mlp.up.weight": "transformer.h.{i}.mlp.up_proj.weight",
    "layers.{i}.mlp.down.weight": "transformer.h.{i}.mlp.down_proj.weight",
    "layers.{i}.mlp.down.bias": "transformer.h.{i}.mlp.down_proj.bias",
}

register(ArchSpec(
    model_type="telechat2",
    make_config=_telechat2_config,
    convert_state=_telechat2_convert_state,
    name_map=TELECHAT2_NAME_MAP,
    layer_modules=[
        ["self_attention.query", "self_attention.key", "self_attention.value"],
        ["self_attention.dense"],
        ["mlp.gate_proj", "mlp.up_proj"],
        ["mlp.down_proj"],
    ],
    module_slots={
        "self_attention.query": "attn.q", "self_attention.key": "attn.k",
        "self_attention.value": "attn.v", "self_attention.dense": "attn.o",
        "mlp.gate_proj": "mlp.gate", "mlp.up_proj": "mlp.up",
        "mlp.down_proj": "mlp.down",
    },
    layers_prefix="transformer.h",
))


def _grinmoe_config(hf: Dict[str, Any]) -> ModelConfig:
    """GRIN-MoE (modeling_grinmoe.py, remote code): the PhiMoE architecture —
    LayerNorm(+bias) norms, optional attention/lm_head biases, 16-expert
    block_sparse_moe with SPARSEMIXER top-2 routing (GRIN's contribution is
    the *training-time* gradient estimator; the inference graph matches
    phimoe, whose forward is oracle-tested here)."""
    import dataclasses as _dc
    return _dc.replace(_phimoe_config(hf), model_type="grinmoe")


register(ArchSpec(
    model_type="grinmoe",
    make_config=_grinmoe_config,
    name_map=PHIMOE_NAME_MAP,
    layer_modules=MIXTRAL_LAYER_MODULES,
    module_slots=MIXTRAL_SLOTS,
))


# -------------------------------------------------------------------- minicpm
def _minicpm_scales(hf: Dict[str, Any]):
    """MiniCPM's three muP-style multipliers (modeling_minicpm.py): embeds
    scaled by scale_emb, each sublayer output by scale_depth/sqrt(L), and
    logits by dim_model_base/hidden (the lm_head input is divided by
    hidden/dim_model_base)."""
    import math as _math
    L = hf["num_hidden_layers"]
    return (hf.get("scale_emb", 1.0),
            hf.get("scale_depth", _math.sqrt(L)) / _math.sqrt(L),
            hf.get("dim_model_base", hf["hidden_size"]) / hf["hidden_size"])


def _minicpm_config(hf: Dict[str, Any]) -> ModelConfig:
    """MiniCPM 1/2 (remote code): llama structure + the muP multipliers —
    the same knob set granite exposes (granite is the test oracle)."""
    import dataclasses as _dc
    emb, res, logit = _minicpm_scales(hf)
    return _dc.replace(
        _llama_config(hf), model_type="minicpm",
        embed_scale=emb, residual_multiplier=res, logit_scale=logit)


register(ArchSpec(
    model_type="minicpm",
    make_config=_minicpm_config,
    name_map=LLAMA_NAME_MAP,
    layer_modules=LLAMA_LAYER_MODULES,
    module_slots=LLAMA_SLOTS,
))


def _minicpm3_config(hf: Dict[str, Any]) -> ModelConfig:
    """MiniCPM3 (remote code): deepseek-v2-style MLA attention (always with
    a q bottleneck) over dense MLP layers, plus MiniCPM's muP multipliers.
    Longrope scaling is not modeled — raise instead of importing wrong."""
    import dataclasses as _dc
    if hf.get("rope_scaling"):
        raise NotImplementedError("minicpm3 longrope scaling not modeled")
    heads = hf["num_attention_heads"]
    nope = hf.get("qk_nope_head_dim", 64)
    rd = hf.get("qk_rope_head_dim", 32)
    emb, res, logit = _minicpm_scales(hf)
    return ModelConfig(
        model_type="minicpm3",
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=heads,
        num_key_value_heads=heads,
        head_dim=nope + rd,
        max_position_embeddings=hf.get("max_position_embeddings", 32768),
        norm="rmsnorm",
        norm_eps=hf.get("rms_norm_eps", 1e-6),
        act=hf.get("hidden_act", "silu"),
        gated_mlp=True,
        pos="rope",
        rope_theta=hf.get("rope_theta", 10000.0),
        rotary_dim=rd,
        rope_interleaved=True,
        attn_scale=(nope + rd) ** -0.5,
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
        mla=True,
        q_lora_rank=hf.get("q_lora_rank", 768),
        kv_lora_rank=hf.get("kv_lora_rank", 256),
        qk_nope_head_dim=nope,
        qk_rope_head_dim=rd,
        v_head_dim=hf.get("v_head_dim") or hf["hidden_size"] // heads,
        embed_scale=emb, residual_multiplier=res, logit_scale=logit,
    )


MINICPM3_NAME_MAP = {k: v for k, v in DEEPSEEK_NAME_MAP.items()
                     if ".moe." not in k}

register(ArchSpec(
    model_type="minicpm3",
    make_config=_minicpm3_config,
    name_map=MINICPM3_NAME_MAP,
    layer_modules=[
        ["self_attn.q_a_proj", "self_attn.kv_a_proj_with_mqa"],
        ["self_attn.q_b_proj", "self_attn.kv_b_proj"],
        ["self_attn.o_proj"],
        ["mlp.gate_proj", "mlp.up_proj"],
        ["mlp.down_proj"],
    ],
    module_slots=DEEPSEEK_SLOTS,
))


# -------------------------------------------------------------------- chatglm
def _chatglm_config(hf: Dict[str, Any]) -> ModelConfig:
    """ChatGLM-2/3 and legacy GLM-4 repos (modeling_chatglm.py, remote
    code): the GLM block transformers models as `Glm` — half-dim interleaved
    rotary, fused qkv with bias (add_qkv_bias), swiglu with fused
    dense_h_to_4h = [gate; up] — under encoder-style names. ChatGLM-1's
    prefix-LM GLMBlock (2D rope, post-norm residual alpha) is a different
    architecture and raises."""
    if not hf.get("rmsnorm", True):
        raise NotImplementedError("chatglm-1 layernorm variant")
    if hf.get("apply_residual_connection_post_layernorm", False):
        raise NotImplementedError("chatglm post-layernorm residual variant")
    heads = hf["num_attention_heads"]
    hd = hf.get("kv_channels") or hf["hidden_size"] // heads
    kv = (hf.get("multi_query_group_num", heads)
          if hf.get("multi_query_attention", False) else heads)
    return ModelConfig(
        model_type="chatglm",
        vocab_size=hf.get("padded_vocab_size", hf.get("vocab_size")),
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["ffn_hidden_size"],
        num_hidden_layers=hf["num_layers"],
        num_attention_heads=heads,
        num_key_value_heads=kv,
        head_dim=hd,
        max_position_embeddings=hf.get("seq_length", 8192),
        norm="rmsnorm",
        norm_eps=hf.get("layernorm_epsilon", 1e-5),
        act="silu",
        gated_mlp=True,
        pos="rope",
        rope_theta=10000.0 * hf.get("rope_ratio", 1.0),
        rotary_dim=hd // 2,
        rope_interleaved=True,
        attn_bias=hf.get("add_qkv_bias", False),
        tie_word_embeddings=False,
        final_layer_norm=hf.get("post_layer_norm", True),
    )


def _chatglm_convert_state(state: Dict[str, Any], hf: Dict[str, Any]) -> Dict[str, Any]:
    """Split query_key_value rows [q; k; v] (kv at multi-query width) and
    dense_h_to_4h rows [gate; up] (modeling_chatglm.py swiglu chunk)."""
    import numpy as _np

    heads = hf["num_attention_heads"]
    hd = hf.get("kv_channels") or hf["hidden_size"] // heads
    kv = (hf.get("multi_query_group_num", heads)
          if hf.get("multi_query_attention", False) else heads)
    qd, kvd = heads * hd, kv * hd
    ffn = hf["ffn_hidden_size"]
    out: Dict[str, Any] = {}
    for k, v in state.items():
        v = _np.asarray(v)
        if "rotary_pos_emb" in k:
            continue
        if ".self_attention.query_key_value." in k:
            base = k.replace("query_key_value", "{}")
            out[base.format("query")] = _np.ascontiguousarray(v[:qd])
            out[base.format("key")] = _np.ascontiguousarray(v[qd:qd + kvd])
            out[base.format("value")] = _np.ascontiguousarray(v[qd + kvd:])
        elif ".mlp.dense_h_to_4h." in k:
            base = k.replace("dense_h_to_4h", "{}")
            out[base.format("gate")] = _np.ascontiguousarray(v[:ffn])
            out[base.format("up")] = _np.ascontiguousarray(v[ffn:])
        else:
            out[k] = v
    return out


CHATGLM_NAME_MAP = {
    "embed_tokens.weight": "transformer.embedding.word_embeddings.weight",
    "final_norm.weight": "transformer.encoder.final_layernorm.weight",
    "lm_head.weight": "transformer.output_layer.weight",
    "layers.{i}.input_norm.weight":
        "transformer.encoder.layers.{i}.input_layernorm.weight",
    "layers.{i}.post_norm.weight":
        "transformer.encoder.layers.{i}.post_attention_layernorm.weight",
    "layers.{i}.attn.q.weight":
        "transformer.encoder.layers.{i}.self_attention.query.weight",
    "layers.{i}.attn.k.weight":
        "transformer.encoder.layers.{i}.self_attention.key.weight",
    "layers.{i}.attn.v.weight":
        "transformer.encoder.layers.{i}.self_attention.value.weight",
    "layers.{i}.attn.q.bias":
        "transformer.encoder.layers.{i}.self_attention.query.bias",
    "layers.{i}.attn.k.bias":
        "transformer.encoder.layers.{i}.self_attention.key.bias",
    "layers.{i}.attn.v.bias":
        "transformer.encoder.layers.{i}.self_attention.value.bias",
    "layers.{i}.attn.o.weight":
        "transformer.encoder.layers.{i}.self_attention.dense.weight",
    "layers.{i}.mlp.gate.weight":
        "transformer.encoder.layers.{i}.mlp.gate.weight",
    "layers.{i}.mlp.up.weight": "transformer.encoder.layers.{i}.mlp.up.weight",
    "layers.{i}.mlp.down.weight":
        "transformer.encoder.layers.{i}.mlp.dense_4h_to_h.weight",
}

register(ArchSpec(
    model_type="chatglm",
    make_config=_chatglm_config,
    convert_state=_chatglm_convert_state,
    name_map=CHATGLM_NAME_MAP,
    layer_modules=[
        ["self_attention.query", "self_attention.key", "self_attention.value"],
        ["self_attention.dense"],
        ["mlp.gate", "mlp.up"],
        ["mlp.dense_4h_to_h"],
    ],
    module_slots={
        "self_attention.query": "attn.q", "self_attention.key": "attn.k",
        "self_attention.value": "attn.v", "self_attention.dense": "attn.o",
        "mlp.gate": "mlp.gate", "mlp.up": "mlp.up",
        "mlp.dense_4h_to_h": "mlp.down",
    },
    layers_prefix="transformer.encoder.layers",
))


# ---------------------------------------------------------------------- hymba
def _hymba_config(hf: Dict[str, Any]) -> ModelConfig:
    """Hymba hybrid-head (reference models/definitions/hymba.py declares
    the arch; block structure per the Hymba paper, NVIDIA 2024). The real
    checkpoint is remote-code with no local oracle (reference
    require_trust_remote_code), so HF config keys are mapped on a
    best-effort basis and documented; the functional contract is pinned by
    the handwritten numpy oracle in tests/test_hymba.py instead.

    Constraint of our hybrid block: d_inner == q_dim (the normed attention
    and SSM branch outputs are averaged elementwise)."""
    heads = hf["num_attention_heads"]
    hidden = hf["hidden_size"]
    head_dim = hf.get("head_dim", hidden // heads)
    d_inner = hf.get("mamba_d_inner", hf.get("ssm_inner", heads * head_dim))
    if d_inner != heads * head_dim:
        raise ValueError("hymba: d_inner must equal num_heads*head_dim "
                         f"(got {d_inner} vs {heads * head_dim})")
    reuse = hf.get("kv_reuse_map")
    return ModelConfig(
        model_type="hymba",
        vocab_size=hf["vocab_size"],
        hidden_size=hidden,
        intermediate_size=hf["intermediate_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=heads,
        num_key_value_heads=hf.get("num_key_value_heads", heads),
        head_dim=head_dim,
        max_position_embeddings=hf.get("max_position_embeddings", 2048),
        norm="rmsnorm",
        norm_eps=hf.get("rms_norm_eps", 1e-6),
        act=hf.get("hidden_act", "silu"),
        gated_mlp=True,
        pos="rope",
        rope_theta=hf.get("rope_theta", 10000.0),
        tie_word_embeddings=hf.get("tie_word_embeddings", True),
        ssm_hybrid=True,
        ssm_inner=d_inner,
        ssm_state=hf.get("ssm_state_size", hf.get("mamba_d_state", 16)),
        ssm_conv=hf.get("conv_kernel", hf.get("mamba_d_conv", 4)),
        ssm_dt_rank=hf.get("time_step_rank", hf.get("mamba_dt_rank")),
        num_meta_tokens=hf.get("num_memory_tokens",
                               hf.get("num_meta_tokens", 0)),
        kv_reuse_map=tuple(reuse) if reuse is not None else None,
    )


def _hymba_convert_state(sd: Dict[str, Any], hf: Dict[str, Any]):
    """Depthwise conv weight [Di, 1, K] -> our [K, Di] tap layout."""
    out = {}
    for k, v in sd.items():
        if k.endswith("conv1d.weight") and getattr(v, "ndim", 0) == 3:
            v = v[:, 0, :].T
        out[k] = v
    return out


HYMBA_NAME_MAP = {
    "embed_tokens.weight": "model.embed_tokens.weight",
    "final_norm.weight": "model.final_layernorm.weight",
    "lm_head.weight": "lm_head.weight",
    "meta_tokens": "model.meta_tokens",
    "layers.{i}.input_norm.weight": "model.layers.{i}.input_layernorm.weight",
    "layers.{i}.post_norm.weight":
        "model.layers.{i}.pre_moe_layernorm.weight",
    "layers.{i}.mamba.in_proj.weight": "model.layers.{i}.mamba.in_proj.weight",
    "layers.{i}.mamba.out_proj.weight":
        "model.layers.{i}.mamba.out_proj.weight",
    "layers.{i}.mamba.conv_w": "model.layers.{i}.mamba.conv1d.weight",
    "layers.{i}.mamba.conv_b": "model.layers.{i}.mamba.conv1d.bias",
    "layers.{i}.mamba.x_proj.weight": "model.layers.{i}.mamba.x_proj.0.weight",
    "layers.{i}.mamba.dt_proj.weight":
        "model.layers.{i}.mamba.dt_proj.0.weight",
    "layers.{i}.mamba.dt_proj.bias": "model.layers.{i}.mamba.dt_proj.0.bias",
    "layers.{i}.mamba.A_log": "model.layers.{i}.mamba.A_log",
    "layers.{i}.mamba.D": "model.layers.{i}.mamba.D",
    "layers.{i}.mamba.attn_norm.weight":
        "model.layers.{i}.mamba.attn_norm.weight",
    "layers.{i}.mamba.ssm_norm.weight":
        "model.layers.{i}.mamba.ssm_norm.weight",
    "layers.{i}.mlp.gate.weight":
        "model.layers.{i}.moe.experts.0.gate_proj.weight",
    "layers.{i}.mlp.up.weight":
        "model.layers.{i}.moe.experts.0.up_proj.weight",
    "layers.{i}.mlp.down.weight":
        "model.layers.{i}.moe.experts.0.down_proj.weight",
}

register(ArchSpec(
    model_type="hymba",
    make_config=_hymba_config,
    convert_state=_hymba_convert_state,
    name_map=HYMBA_NAME_MAP,
    # reference hymba.py layer_modules: mamba.in_proj / mamba.out_proj /
    # the single-expert MLP (x_proj/dt_proj stay unquantized there too)
    layer_modules=[
        ["mamba.in_proj"],
        ["mamba.out_proj"],
        ["moe.experts.0.up_proj", "moe.experts.0.gate_proj"],
        ["moe.experts.0.down_proj"],
    ],
    module_slots={
        "mamba.in_proj": "mamba.in_proj",
        "mamba.out_proj": "mamba.out_proj",
        "moe.experts.0.gate_proj": "mlp.gate",
        "moe.experts.0.up_proj": "mlp.up",
        "moe.experts.0.down_proj": "mlp.down",
    },
))
