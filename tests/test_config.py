import json

import pytest

from ganq_tpu.core.config import FORMAT, QUANT_METHOD, QuantizeConfig, dynamic_get


def test_defaults_gptq():
    cfg = QuantizeConfig()
    assert cfg.bits == 4
    assert cfg.quant_method == QUANT_METHOD.GPTQ
    assert cfg.format == FORMAT.GPTQ
    assert cfg.resolved_act_sort() == "desc"  # desc_act default True


def test_ganq_defaults_and_recipe():
    cfg = QuantizeConfig(
        bits=4, quant_method="ganq", ganq_iterations=10,
        act_sort="asc", l_damp_style="ganq", dead="mean",
    )
    assert cfg.format == FORMAT.LUT
    assert cfg.resolved_act_sort() == "asc"
    assert cfg.ganq_iterations == 10


def test_ganq_auto_act_sort():
    cfg = QuantizeConfig(quant_method=QUANT_METHOD.GANQ)
    assert cfg.resolved_act_sort() == "asc"


def test_invalid_combinations():
    with pytest.raises(ValueError):
        QuantizeConfig(bits=5)
    with pytest.raises(ValueError):
        QuantizeConfig(quant_method="gptq", format="lut")
    with pytest.raises(ValueError):
        QuantizeConfig(damp_percent=1.5)
    with pytest.raises(ValueError):
        QuantizeConfig(dead="nope")


def test_dynamic_overrides_order_and_match():
    cfg = QuantizeConfig(dynamic={
        "+:.*mlp.*": {"bits": 8, "group_size": 32},
        "-:.*lm_head.*": {},
    })
    # negative rules sorted first
    assert list(cfg.dynamic.keys())[0].startswith("-")
    assert cfg.dynamic_get("model.layers.0.mlp.up_proj", "bits", 4) == 8
    assert cfg.dynamic_get("model.layers.0.self_attn.q_proj", "bits", 4) == 4
    assert cfg.dynamic_get("lm_head", "bits", 4) is False

    eff = cfg.for_module("model.layers.0.mlp.up_proj")
    assert eff.bits == 8 and eff.group_size == 32
    assert cfg.for_module("lm_head") is None
    assert cfg.for_module("model.layers.0.self_attn.q_proj").bits == 4


def test_dynamic_sub_key():
    d = {"+:.*": {"adapter": {"rank": 512}}}
    assert dynamic_get(d, "x.y", "adapter", sub_key="rank") == 512


def test_json_roundtrip(tmp_path):
    cfg = QuantizeConfig(bits=4, quant_method="ganq", act_sort="asc",
                         l_damp_style="ganq", dead="mean", ganq_iterations=10,
                         meta={"quantizer": "ganq-tpu:0.1.0"})
    cfg.save_pretrained(str(tmp_path))
    loaded = QuantizeConfig.from_pretrained(str(tmp_path))
    assert loaded.bits == cfg.bits
    assert loaded.quant_method == QUANT_METHOD.GANQ
    assert loaded.format == FORMAT.LUT
    assert loaded.act_sort == "asc"
    assert loaded.meta["quantizer"] == "ganq-tpu:0.1.0"


def test_hf_synonyms(tmp_path):
    # checkpoint_format / w_bit / q_group_size synonyms (ecosystem compat)
    d = {"w_bit": 4, "q_group_size": 64, "checkpoint_format": "gptq",
         "quant_method": "gptq", "sym": True}
    cfg = QuantizeConfig.from_dict(d)
    assert cfg.bits == 4 and cfg.group_size == 64 and cfg.format == FORMAT.GPTQ

    # fall back to config.json quantization_config
    (tmp_path / "config.json").write_text(json.dumps({
        "model_type": "opt", "quantization_config": d}))
    cfg2 = QuantizeConfig.from_pretrained(str(tmp_path))
    assert cfg2.group_size == 64
