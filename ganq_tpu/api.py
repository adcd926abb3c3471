"""Top-level user API: the ``GPTQModel`` facade equivalent.

Mirrors the reference's L1 surface (``gptqmodel/models/auto.py:197-618`` +
``BaseGPTQModel`` methods): ``GanqModel.load`` auto-detects quantized vs fp
checkpoints, ``.quantize()`` runs the layer-wise engine, ``.save()`` writes
the packed checkpoint, ``.generate()`` runs the jitted engine (tokenizer-aware
when one is available locally), ``.serve()`` starts the OpenAI-compatible
server, and ``.perplexity()`` / ``.eval()`` drive the eval tooling.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from .core.backend import select_backend
from .core.config import QuantizeConfig
from .formats import checkpoint
from .models import hf_import
from .models.registry import get_spec
from .models.transformer import ModelConfig, forward
from .quant.looper import QuantizeOutput, quantize_model
from .serve.engine import Engine
from .utils.logger import get_logger

log = get_logger(__name__)


def _has_quantize_config(path: str) -> bool:
    if os.path.isfile(os.path.join(path, "quantize_config.json")):
        return True
    cfg = os.path.join(path, "config.json")
    if os.path.isfile(cfg):
        import json
        with open(cfg) as f:
            return "quantization_config" in json.load(f)
    return False


def _default_backend() -> str:
    return "pallas" if jax.default_backend() != "cpu" else "reference"


class GanqModel:
    """A (ModelConfig, params) pair plus quantization state and tooling."""

    def __init__(self, cfg: ModelConfig, params: Dict[str, Any],
                 qcfg: Optional[QuantizeConfig] = None,
                 tokenizer=None, model_dir: Optional[str] = None,
                 quantized: bool = False):
        self.cfg = cfg
        self.params = params
        self.qcfg = qcfg
        self.tokenizer = tokenizer
        self.model_dir = model_dir
        self.quantized = quantized
        self._quant_output: Optional[QuantizeOutput] = None
        # VL models: raw visual.* HF tensors (vision tower stays fp; kept for
        # serving + checkpoint passthrough). Populated by load/from_torch_model.
        self.vision_state: Optional[Dict[str, np.ndarray]] = None
        if quantized:
            self.backend = str(select_backend(params))
        else:
            self.backend = _default_backend()

    # ------------------------------------------------------------------ load
    @classmethod
    def load(cls, model_dir: str,
             quantize_config: Optional[QuantizeConfig] = None,
             dtype=jnp.float32) -> "GanqModel":
        """Load an fp checkpoint (for quantization) or a quantized checkpoint
        (for inference) from a local directory — reference ``GPTQModel.load``
        (auto.py:197-254)."""
        tokenizer = cls._try_tokenizer(model_dir)
        if _has_quantize_config(model_dir):
            cfg, params, qcfg = checkpoint.load_quantized(model_dir)
            log.info(f"loaded quantized checkpoint ({qcfg.quant_method}/"
                     f"{qcfg.format}) from {model_dir}")
            m = cls(cfg, params, qcfg, tokenizer, model_dir, quantized=True)
        else:
            cfg, params = hf_import.params_from_dir(model_dir, dtype=dtype)
            m = cls(cfg, params, quantize_config, tokenizer, model_dir)
        if cfg.model_type == "qwen2_vl":
            from .models.qwen2_vl_vision import extract_vision_state
            # "or None": a checkpoint without visual.* tensors yields {},
            # which must normalize to None so _get_vl_engine raises its
            # clear "no vision tower loaded" error instead of a KeyError
            m.vision_state = extract_vision_state(
                dict(hf_import.iter_safetensors(model_dir))) or None
        elif cfg.model_type == "mllama":
            from .serve.mllama_vl import extract_vl_state
            m.vision_state = extract_vl_state(
                dict(hf_import.iter_safetensors(model_dir)),
                hf_import.load_hf_config(model_dir))
        elif cfg.model_type == "ovis2":
            from .models.ovis2_vision import extract_vision_state
            m.vision_state = extract_vision_state(
                dict(hf_import.iter_safetensors(model_dir)))
        elif cfg.model_type == "ovis":
            from .models.ovis16_vision import extract_vision_state
            m.vision_state = extract_vision_state(
                dict(hf_import.iter_safetensors(model_dir)))
        return m

    @classmethod
    def from_torch_model(cls, model, quantize_config: Optional[QuantizeConfig] = None,
                         tokenizer=None) -> "GanqModel":
        cfg, params = hf_import.params_from_torch_model(model)
        m = cls(cfg, params, quantize_config, tokenizer)
        if cfg.model_type == "qwen2_vl":
            from .models.qwen2_vl_vision import extract_vision_state
            state = {k: v.detach().cpu().numpy()
                     for k, v in model.state_dict().items()}
            m.vision_state = extract_vision_state(state)
            m._hf_config_cache = model.config.to_dict()
        elif cfg.model_type == "mllama":
            from .serve.mllama_vl import extract_vl_state
            state = {k: v.detach().cpu().numpy()
                     for k, v in model.state_dict().items()}
            m._hf_config_cache = model.config.to_dict()
            m.vision_state = extract_vl_state(state, m._hf_config_cache)
        elif cfg.model_type == "ovis2":
            from .models.ovis2_vision import extract_vision_state
            state = {k: v.detach().cpu().numpy()
                     for k, v in model.state_dict().items()}
            m._hf_config_cache = model.config.to_dict()
            m.vision_state = extract_vision_state(state)
        elif cfg.model_type == "ovis":
            from .models.ovis16_vision import extract_vision_state
            state = {k: v.detach().cpu().numpy()
                     for k, v in model.state_dict().items()}
            m._hf_config_cache = model.config.to_dict()
            m.vision_state = extract_vision_state(state)
        return m

    @staticmethod
    def _try_tokenizer(model_dir: str):
        try:
            from transformers import AutoTokenizer
            return AutoTokenizer.from_pretrained(model_dir, local_files_only=True)
        except Exception:
            return None

    # -------------------------------------------------------------- quantize
    def quantize(self, calibration_dataset: Sequence[Any],
                 batch_size: int = 1,
                 calibration_concat_size: Optional[int] = None,
                 resume_dir: Optional[str] = None) -> List[Any]:
        """Run layer-wise PTQ. ``calibration_dataset``: token-id arrays,
        {"input_ids": ...} dicts, {"inputs_embeds": ...} pre-embedded rows,
        or strings (tokenizer required). ``resume_dir``: checkpoint each
        layer's artifacts there and resume a crashed run after the last
        completed layer (net-new vs the reference, which restarts from
        scratch — SURVEY.md §5.4)."""
        if self.quantized:
            raise RuntimeError("model is already quantized")
        qcfg = self.qcfg or QuantizeConfig()
        self.qcfg = qcfg
        if qcfg.rotation:
            # QuaRot R1: fuse norms + rotate the residual basis before
            # quantization (reference base.py:402-424 rotation path)
            from .quant.rotation import rotate_model
            import dataclasses as _dc
            rotate_model(self.cfg, self.params, qcfg.rotation)
            # rotated models carry an explicit (rotated) lm_head
            self.cfg = _dc.replace(self.cfg, tie_word_embeddings=False)
            self._rotated = True
        spec = get_spec(self.cfg.model_type).expand(self.cfg.num_experts)
        batches = prepare_dataset(calibration_dataset, self.tokenizer,
                                  batch_size, calibration_concat_size)
        out = quantize_model(self.cfg, self.params, spec, qcfg, batches,
                             resume_dir=resume_dir)
        self._quant_output = out
        self.params = out.params
        self.quantized = True
        return out.log

    # ------------------------------------------------------------------ save
    def save(self, save_dir: str) -> None:
        if self._quant_output is None:
            raise RuntimeError("nothing to save: call quantize() first")
        hf_config = self._hf_config_dict()
        if getattr(self, "_rotated", False):
            hf_config = dict(hf_config, tie_word_embeddings=False)
        checkpoint.save_quantized(save_dir, hf_config, self.qcfg,
                                  self._quant_output.params,
                                  self._quant_output.artifacts,
                                  self._quant_output.log,
                                  extra_state=self.vision_state)
        if self.tokenizer is not None:
            try:
                self.tokenizer.save_pretrained(save_dir)
            except Exception:
                pass

    def _hf_config_dict(self) -> Dict[str, Any]:
        if getattr(self, "_hf_config_cache", None) is not None:
            return self._hf_config_cache
        if self.model_dir and os.path.isfile(os.path.join(self.model_dir, "config.json")):
            return hf_import.load_hf_config(self.model_dir)
        c = self.cfg
        if c.model_type == "opt":
            return {"model_type": "opt", "vocab_size": c.vocab_size,
                    "hidden_size": c.hidden_size, "ffn_dim": c.intermediate_size,
                    "num_hidden_layers": c.num_hidden_layers,
                    "num_attention_heads": c.num_attention_heads,
                    "max_position_embeddings": c.max_position_embeddings,
                    "do_layer_norm_before": c.do_layer_norm_before,
                    "word_embed_proj_dim": c.word_embed_proj_dim or c.hidden_size,
                    "activation_function": c.act,
                    "tie_word_embeddings": c.tie_word_embeddings}
        return {"model_type": c.model_type, "vocab_size": c.vocab_size,
                "hidden_size": c.hidden_size,
                "intermediate_size": c.intermediate_size,
                "num_hidden_layers": c.num_hidden_layers,
                "num_attention_heads": c.num_attention_heads,
                "num_key_value_heads": c.num_key_value_heads,
                "head_dim": c.head_dim,
                "max_position_embeddings": c.max_position_embeddings,
                "rms_norm_eps": c.norm_eps, "rope_theta": c.rope_theta,
                "rope_scaling": c.rope_scaling, "hidden_act": c.act,
                "attention_bias": c.attn_bias, "mlp_bias": c.mlp_bias,
                "tie_word_embeddings": c.tie_word_embeddings}

    # -------------------------------------------------------------- generate
    def _get_engine(self, max_seq: int) -> Engine:
        """Engine cache: the auto-stacked layout copies layer weights at
        construction, so per-call construction would re-copy the model every
        generate; reuse while (params, backend, max_seq) are unchanged."""
        key = (self.backend, max_seq)
        cached = getattr(self, "_engines", {}).get(key)
        if cached is not None and cached[0] is self.params:
            return cached[1]
        eng = Engine(self.cfg, self.params, backend=self.backend,
                     max_seq=max_seq)
        engines = getattr(self, "_engines", {})
        engines[key] = (self.params, eng)
        self._engines = engines
        return eng

    def _get_vl_engine(self, max_seq: int):
        """Lazy multimodal engine: fp vision tower + the quantized text
        decoder — qwen2_vl under M-RoPE (serve/vl.py), mllama under gated
        cross-attention (serve/mllama_vl.py)."""
        if self.vision_state is None:
            raise ValueError(
                "no vision tower loaded: multimodal generate requires a "
                "VL checkpoint whose vision weights are present")
        cached = getattr(self, "_vl_engine", None)
        if (cached is not None and cached.params is self.params
                and cached.backend == self.backend
                and cached.max_seq == max_seq):
            return cached
        if self.cfg.model_type == "mllama":
            from .serve.mllama_vl import MllamaVLEngine
            eng = MllamaVLEngine.build(
                self.cfg, self.params, self._hf_config_dict(),
                self.vision_state, backend=self.backend, max_seq=max_seq)
        elif self.cfg.model_type == "ovis2":
            from .serve.ovis2_vl import Ovis2VLEngine
            eng = Ovis2VLEngine.build(
                self.cfg, self.params, self._hf_config_dict(),
                self.vision_state, backend=self.backend, max_seq=max_seq)
        elif self.cfg.model_type == "ovis":
            # ovis-1.6: same engine, SigLIP tower (VERDICT r4 #8)
            from .serve.ovis2_vl import Ovis2VLEngine
            eng = Ovis2VLEngine.build_ovis16(
                self.cfg, self.params, self._hf_config_dict(),
                self.vision_state, backend=self.backend, max_seq=max_seq)
        else:
            from .models.qwen2_vl_vision import (import_vision_params,
                                                 vision_config_from_hf)
            from .serve.vl import VLEngine
            vcfg, toks = vision_config_from_hf(self._hf_config_dict())
            vparams = import_vision_params(self.vision_state, vcfg)
            eng = VLEngine(self.cfg, self.params, vcfg, vparams, toks,
                           backend=self.backend, max_seq=max_seq)
        self._vl_engine = eng
        return eng

    def generate(self, inputs: Union[str, Sequence[int], np.ndarray],
                 max_new_tokens: int = 64, temperature: float = 0.0,
                 top_k: int = 0, top_p: float = 1.0, max_seq: int = 2048,
                 seed: int = 0,
                 pixel_values: Optional[np.ndarray] = None,
                 image_grid_thw: Optional[np.ndarray] = None,
                 pixel_values_videos: Optional[np.ndarray] = None,
                 video_grid_thw: Optional[np.ndarray] = None,
                 aspect_ratio_ids: Optional[np.ndarray] = None,
                 aspect_ratio_mask: Optional[np.ndarray] = None,
                 cross_attention_mask: Optional[np.ndarray] = None
                 ) -> Union[str, np.ndarray]:
        """String-aware generate (reference base.py:1164-1177). Passing
        processor outputs (``pixel_values`` + ``image_grid_thw`` for
        qwen2-vl / the aspect-ratio triple for mllama, and/or the video
        pair) routes through the multimodal engines (serve/vl.py,
        serve/mllama_vl.py)."""
        is_str = isinstance(inputs, str)
        if is_str:
            if self.tokenizer is None:
                raise ValueError("string input requires a tokenizer")
            ids = np.asarray(self.tokenizer(inputs)["input_ids"], np.int32)[None, :]
        else:
            ids = np.asarray(inputs, np.int32)
            if ids.ndim == 1:
                ids = ids[None, :]
        eos = -1
        if self.tokenizer is not None and self.tokenizer.eos_token_id is not None:
            eos = int(self.tokenizer.eos_token_id)
        if pixel_values is not None or pixel_values_videos is not None:
            vl = self._get_vl_engine(min(max_seq,
                                         self.cfg.max_position_embeddings))
            if self.cfg.model_type == "mllama":
                if aspect_ratio_ids is None or cross_attention_mask is None:
                    raise ValueError(
                        "mllama multimodal generate needs aspect_ratio_ids, "
                        "aspect_ratio_mask and cross_attention_mask "
                        "(processor outputs)")
                if pixel_values_videos is not None or video_grid_thw is not None:
                    raise ValueError(
                        "mllama multimodal generate supports images only; "
                        "video inputs are not supported for this architecture")
                out = vl.generate(ids, pixel_values, aspect_ratio_ids,
                                  aspect_ratio_mask, cross_attention_mask,
                                  max_new_tokens=max_new_tokens,
                                  temperature=temperature, top_k=top_k,
                                  top_p=top_p, eos_id=eos, seed=seed)
            elif self.cfg.model_type in ("ovis2", "ovis"):
                if (pixel_values_videos is not None or video_grid_thw is not None
                        or image_grid_thw is not None):
                    raise ValueError(
                        "ovis multimodal generate supports pixel_values only; "
                        "video inputs (pixel_values_videos/video_grid_thw) and "
                        "image_grid_thw are not supported for this architecture")
                out = vl.generate(ids, pixel_values=pixel_values,
                                  max_new_tokens=max_new_tokens,
                                  temperature=temperature, top_k=top_k,
                                  top_p=top_p, eos_id=eos, seed=seed)
            else:
                out = vl.generate(ids, pixel_values=pixel_values,
                                  image_grid_thw=image_grid_thw,
                                  pixel_values_videos=pixel_values_videos,
                                  video_grid_thw=video_grid_thw,
                                  max_new_tokens=max_new_tokens,
                                  temperature=temperature, top_k=top_k,
                                  top_p=top_p, eos_id=eos, seed=seed)
            if is_str:
                return self.tokenizer.decode(
                    [t for t in out[0].tolist() if t != eos])
            return out
        eng = self._get_engine(min(max_seq, self.cfg.max_position_embeddings))
        out = eng.generate(ids, max_new_tokens=max_new_tokens,
                           temperature=temperature, top_k=top_k, top_p=top_p,
                           eos_id=eos, seed=seed)
        if is_str:
            return self.tokenizer.decode(
                [t for t in out[0].tolist() if t != eos])
        return out

    def generate_stream(self, inputs: Union[str, Sequence[int], np.ndarray],
                        max_new_tokens: int = 64, temperature: float = 0.0,
                        top_k: int = 0, top_p: float = 1.0,
                        max_seq: int = 2048, seed: int = 0):
        """Incremental generate: yields text deltas for string input, token
        ids otherwise (the engine of the server's SSE streaming mode).

        Text deltas are computed by re-decoding the accumulated ids and
        emitting the suffix, so BPE merges and multi-byte characters never
        split across chunks."""
        is_str = isinstance(inputs, str)
        if is_str:
            if self.tokenizer is None:
                raise ValueError("string input requires a tokenizer")
            ids = np.asarray(self.tokenizer(inputs)["input_ids"], np.int32)
        else:
            ids = np.asarray(inputs, np.int32).reshape(-1)
        eos = -1
        if self.tokenizer is not None and self.tokenizer.eos_token_id is not None:
            eos = int(self.tokenizer.eos_token_id)
        eng = self._get_engine(min(max_seq, self.cfg.max_position_embeddings))
        produced: list = []
        prev_text = ""
        for t in eng.stream(ids, max_new_tokens=max_new_tokens,
                            temperature=temperature, top_k=top_k, top_p=top_p,
                            eos_id=eos, seed=seed):
            if not is_str:
                yield t
                continue
            produced.append(t)
            text = self.tokenizer.decode(produced)
            if text.endswith("�"):  # mid-multibyte: hold the delta back
                continue
            if len(text) > len(prev_text):
                yield text[len(prev_text):]
                prev_text = text

    # ------------------------------------------------------------------ eval
    def eval(self, framework: str = "mc", **kw):
        """Evaluation facade (reference GPTQModel.eval, auto.py:318-494).

        framework="lm_eval": lm-eval harness via the GanqLM adapter
        (tasks=[...] kwargs pass through); "mc": offline multiple-choice
        (examples=[{query, choices, gold}, ...])."""
        if framework == "lm_eval":
            from .evals.harness import GanqLM
            import lm_eval
            return lm_eval.simple_evaluate(model=GanqLM(self), **kw)
        if framework == "mc":
            from .evals.harness import multiple_choice_eval
            return multiple_choice_eval(self, kw["examples"],
                                        tokenizer=self.tokenizer)
        if framework == "mmlupro":
            # reference utils/mmlupro.py CoT loop; rows from local files
            # (test_rows/val_rows lists or test_path/val_path JSON(L))
            from .evals.mmlupro import load_rows, run_mmlupro
            test_rows = kw.get("test_rows") or load_rows(kw["test_path"])
            val_rows = kw.get("val_rows") or load_rows(kw["val_path"])
            gen = kw.get("generate_fn") or (lambda p: self.generate(
                p, max_new_tokens=kw.get("max_new_tokens", 512)))
            return run_mmlupro(gen, test_rows, val_rows,
                               ntrain=kw.get("ntrain", 5),
                               limit=kw.get("limit"))
        if framework == "evalplus":
            # evalplus-style pass@1 over local humaneval-schema JSONL
            from .evals.codegen_eval import load_tasks, run_code_eval
            tasks = kw.get("tasks") or load_tasks(kw["tasks_path"])
            gen = kw.get("generate_fn") or (lambda p: self.generate(
                p, max_new_tokens=kw.get("max_new_tokens", 512)))
            return run_code_eval(gen, tasks, limit=kw.get("limit"))
        raise ValueError(f"unknown eval framework {framework}")

    def perplexity(self, tokens: np.ndarray, seqlen: int = 2048,
                   limit: Optional[int] = None) -> float:
        """Fixed-stride wikitext-style ppl (the README-number recipe)."""
        from .evals.perplexity import fixed_stride_ppl
        fwd = lambda p, ids: forward(self.cfg, p, ids, backend=self.backend)
        return fixed_stride_ppl(fwd, self.params, tokens, seqlen=seqlen,
                                limit=limit)

    def push_to_hub(self, repo_id: str, save_dir: Optional[str] = None, **kw):
        """Upload a saved checkpoint (reference GPTQModel.push_to_hub,
        auto.py:534). Requires network egress + huggingface_hub."""
        try:
            from huggingface_hub import HfApi
        except ImportError as e:
            raise RuntimeError(
                "huggingface_hub is not available in this environment "
                "(zero-egress); copy the checkpoint directory out instead") from e
        if save_dir is None:
            raise ValueError("pass save_dir (a directory produced by .save())")
        api = HfApi()
        api.create_repo(repo_id, exist_ok=True, **kw)
        api.upload_folder(folder_path=save_dir, repo_id=repo_id)

    # ------------------------------------------------------------------ eora
    def eora_generate(self, fp_model, calibration_dataset: Sequence[Any],
                      rank: int = 64, batch_size: int = 1,
                      save_adapter_to: Optional[str] = None) -> List[str]:
        """Post-quant EoRA accuracy-recovery adapters (reference
        ``GPTQModel.adapter.generate``, auto.py:566-618 — the
        Dequantize+Eora pipeline, base.py:461-524).

        ``fp_model``: the ORIGINAL fp checkpoint this quantized model came
        from (a local HF-layout directory or a live transformers model).
        Attaches rank-``rank`` lora_a/lora_b to every quantized linear
        (applied fused in-dispatch) and, with ``save_adapter_to``, writes
        PEFT-style ``adapter_model.safetensors`` + ``adapter_config.json``
        that :meth:`load` re-attaches automatically."""
        if not self.quantized:
            raise RuntimeError("eora_generate needs a quantized model; "
                               "load a quantized checkpoint first")
        if isinstance(fp_model, str):
            fcfg, fparams = hf_import.params_from_dir(fp_model)
        else:
            fcfg, fparams = hf_import.params_from_torch_model(fp_model)
        if (fcfg.model_type, fcfg.hidden_size) != (self.cfg.model_type,
                                                   self.cfg.hidden_size):
            raise ValueError(
                f"fp model {fcfg.model_type}/{fcfg.hidden_size} does not "
                f"match quantized {self.cfg.model_type}/{self.cfg.hidden_size}")
        from .models.registry import resolve_spec
        spec = resolve_spec(get_spec(self.cfg.model_type),
                            self._hf_config_dict())
        spec = spec.expand(self.cfg.num_experts)
        from .quant.eora_flow import generate_eora
        batches = prepare_dataset(calibration_dataset, self.tokenizer,
                                  batch_size)
        done = generate_eora(self.cfg, fparams, self.params, spec, rank,
                             batches)
        log.info(f"attached EoRA rank-{rank} adapters to {len(done)} modules")
        if save_adapter_to:
            n = checkpoint.save_adapter(save_adapter_to, spec, self.params,
                                        self.cfg.num_hidden_layers)
            log.info(f"saved {n} adapters to {save_adapter_to}")
        return done

    def export_mlx(self, save_dir: str) -> Dict[str, int]:
        """Write an mlx-lm-loadable checkpoint (reference
        ``GPTQModel.export(format="mlx")``, auto.py:496-523 — which
        dequantizes and lets mlx requantize). Uniform-format modules map
        LOSSLESSLY onto mlx's affine layout (scales/biases/packed uint32);
        everything mlx cannot represent is written fp16. Needs no mlx
        installation (formats/mlx_export.py)."""
        from .formats.mlx_export import export_mlx as _export
        from .models.registry import get_spec as _gs

        if self._quant_output is not None:
            # freshly quantized params hold fake-quant DENSE weights; the
            # packed QLinear modules the exporter reads only exist after a
            # save/load round trip — do it through a temp dir
            import shutil
            import tempfile
            tmp = tempfile.mkdtemp(prefix="ganq_mlx_")
            try:
                self.save(tmp)
                return GanqModel.load(tmp).export_mlx(save_dir)
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
        spec = _gs(self.cfg.model_type).expand(self.cfg.num_experts)
        return _export(save_dir, self._hf_config_dict(), spec, self.params,
                       self.cfg.num_hidden_layers, tokenizer=self.tokenizer)

    # ---------------------------------------------------------------- export
    def export_dequantized(self, save_dir: str) -> None:
        """Write a plain fp checkpoint with every quantized weight
        materialized (the reference's dequant export path,
        auto.py:496 / qlinear/torch.py:179-204)."""
        import json as _json

        from .formats.checkpoint import _write_sharded
        from .models.registry import get_spec as _gs
        from .ops.qlinear import QLinear, dequantize_weight

        spec = _gs(self.cfg.model_type).expand(self.cfg.num_experts)
        state: Dict[str, np.ndarray] = {}

        def fetch(ours: str):
            cur: Any = self.params
            for part in ours.split("."):
                if isinstance(cur, QLinear):
                    if part == "weight":
                        return np.asarray(dequantize_weight(cur))
                    cur = cur.get(part)
                elif isinstance(cur, dict):
                    cur = cur.get(part)
                elif isinstance(cur, list):
                    cur = cur[int(part)]
                else:
                    return None
                if cur is None:
                    return None
            if isinstance(cur, QLinear):
                return None
            return np.asarray(cur)

        for ours_tpl, theirs_tpl in spec.name_map.items():
            if "{i}" in ours_tpl:
                for i in range(self.cfg.num_hidden_layers):
                    v = fetch(ours_tpl.format(i=i))
                    if v is not None:
                        state[theirs_tpl.format(i=i)] = v
            else:
                v = fetch(ours_tpl)
                if v is not None:
                    state[theirs_tpl] = v
        os.makedirs(save_dir, exist_ok=True)
        _write_sharded(save_dir, state, 4 * 1024**3)
        with open(os.path.join(save_dir, "config.json"), "w") as f:
            _json.dump(self._hf_config_dict(), f, indent=2)
        log.info(f"exported dequantized checkpoint to {save_dir}")

    # -------------------------------------------------------------- optimize
    def optimize(self, recode: str = "auto") -> "GanqModel":
        """Pick the fastest serving path (the reference's ``model.optimize()``
        torch.compile analog, base.py:1240-1276).

        ``recode``: "auto" certifies grid-representable LUT codebooks to the
        packed-4-bit uniform path (lossless, ops/qlinear.certify_uniform)
        and recodes the rest — incl. bits=3 LUTs — to per-128-group
        int8 (recode_uniform8 — the w8p plane-megastep feed; measured
        +0.03 ppl over the exact 16-entry LUT and +0.15 over the exact
        8-entry one, PERF.md r4/r5; load WITHOUT optimize() to serve
        bits=3 LUTs exactly through the walsh megastep at 3 bits/weight);
        "u4" snaps bits=3 LUT codebooks onto the per-row 16-level
        affine grid (recode_uniform4 — W4-bytes decode at a small,
        measured ppl cost; non-bits-3 LUTs fall back to "auto"
        semantics); "affine" certifies only (non-affine LUTs stay exact);
        "w8" per-row int8-recodes every LUT (the legacy path); "none"
        leaves kinds as loaded. Then auto-selects the kernel backend."""
        if recode in ("auto", "affine", "w8", "u4"):
            from .ops.qlinear import (QLinear, certify_uniform,
                                      recode_uniform4, recode_uniform8,
                                      recode_w8)

            def rec(v):
                if recode in ("auto", "affine", "u4"):
                    q = certify_uniform(v)
                    if q is not None:
                        return q
                if recode == "u4":
                    q4 = recode_uniform4(v)
                    if q4 is not v:
                        return q4
                    return recode_uniform8(v)
                if recode == "auto":
                    # bits=3 LUTs included: the int8 recode costs +0.15
                    # of a +14.5 ppl delta (measured, PERF.md r5) and
                    # serves 2.6x faster than the exact walsh path at
                    # decode batch; loading WITHOUT optimize() keeps the
                    # exact wl8 serving
                    return recode_uniform8(v)
                if recode == "w8":
                    return recode_w8(v)
                return v

            def walk(node):
                if isinstance(node, dict):
                    for k, v in node.items():
                        if isinstance(v, QLinear):
                            node[k] = rec(v)
                        else:
                            walk(v)
                elif isinstance(node, list):
                    for v in node:
                        walk(v)

            walk(self.params)
        # fused-MoE decode operands (ops/moe_expert.py, VERDICT r4 #5):
        # pre-pack each MoE layer's uniform experts into the slot-steered
        # kernel's plane layout; the decode path engages automatically
        # (models/transformer._moe_combine). Prefill keeps the per-expert
        # artifacts, so both live side by side.
        if jax.default_backend() != "cpu":
            from .ops.moe_expert import moe_mega_fusable, moe_megapack
            for lp in self.params.get("layers", []):
                moe = lp.get("moe") if isinstance(lp, dict) else None
                if (isinstance(moe, dict) and "experts" in moe
                        and "mega" not in moe):
                    bits = getattr(moe["experts"][0].get("gate"), "bits",
                                   None)
                    if bits and moe_mega_fusable(self.cfg, moe, bits):
                        moe["mega"] = dict(jax.jit(
                            lambda m, b=bits: moe_megapack(self.cfg, m, b)
                        )(moe))
        self.backend = str(select_backend(self.params))
        return self

    # ----------------------------------------------------------------- serve
    def serve(self, host: str = "127.0.0.1", port: int = 8000, **kw):
        from .serve.openai_server import OpenAIServer
        server = OpenAIServer(self, host=host, port=port, **kw)
        server.start()
        return server


def prepare_dataset(dataset: Sequence[Any], tokenizer, batch_size: int = 1,
                    concat_size: Optional[int] = None) -> List[np.ndarray]:
    """Normalize calibration data to [batch, seq] id arrays.

    Accepts strings (tokenized), {"input_ids": ...} dicts, or raw id arrays.
    ``concat_size`` packs all rows into fixed-length blocks, the reference's
    ``calibration_dataset_concat_size`` mode (base.py:243-307).
    """
    rows: List[np.ndarray] = []
    embed_rows: List[np.ndarray] = []
    for item in dataset:
        if isinstance(item, str):
            if tokenizer is None:
                raise ValueError("string calibration data requires a tokenizer")
            ids = np.asarray(tokenizer(item)["input_ids"], np.int32)
        elif isinstance(item, dict):
            if "inputs_embeds" in item:
                # pre-embedded multimodal calibration row [seq, hidden]
                # (models/vl_calib.capture_decoder_inputs output)
                embed_rows.append(np.asarray(item["inputs_embeds"],
                                             np.float32).reshape(
                    -1, np.asarray(item["inputs_embeds"]).shape[-1]))
                continue
            ids = np.asarray(item["input_ids"], np.int32).reshape(-1)
        else:
            arr = np.asarray(item)
            if np.issubdtype(arr.dtype, np.floating):
                embed_rows.append(arr.reshape(-1, arr.shape[-1]))
                continue
            ids = arr.astype(np.int32).reshape(-1)
        if ids.size:
            rows.append(ids)
    if not rows and not embed_rows:
        raise ValueError("empty calibration dataset")
    if len(rows) + len(embed_rows) < 256:
        log.warning(f"calibration dataset is small "
                    f"({len(rows) + len(embed_rows)} rows); the "
                    "reference recommends >=256 (loop_processor.py:95-127)")

    if concat_size is not None and rows:
        stream = np.concatenate(rows)
        n = (len(stream) // concat_size) * concat_size
        rows = list(stream[:n].reshape(-1, concat_size))

    # bucket rows of equal length into batches (static shapes for jit)
    by_len: Dict[int, List[np.ndarray]] = {}
    for r in rows:
        by_len.setdefault(len(r), []).append(r)
    batches: List[np.ndarray] = []
    for ln, group in by_len.items():
        for i in range(0, len(group), batch_size):
            batches.append(np.stack(group[i:i + batch_size]))
    by_len_e: Dict[int, List[np.ndarray]] = {}
    for r in embed_rows:
        by_len_e.setdefault(len(r), []).append(r)
    for ln, group in by_len_e.items():
        for i in range(0, len(group), batch_size):
            batches.append(np.stack(group[i:i + batch_size]))
    return batches


__all__ = ["GanqModel", "prepare_dataset"]
