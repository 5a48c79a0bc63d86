"""Config parsing tests: the reference's shipped YAML files must parse."""

import pytest

from llamole_tpu.config import get_infer_args, get_train_args, parse_args


def test_reference_train_yaml_parses():
    model, data, train, ft, gen = get_train_args(
        "/root/reference/config/train/llama_lora.yaml"
    )
    assert model.model_name_or_path == "meta-llama/Meta-Llama-3.1-8B-Instruct"
    assert len(model.special_token_list()) == 9
    assert data.cutoff_len == 2048
    assert data.learned_query_size == 8
    assert train.per_device_train_batch_size == 10
    assert train.gradient_accumulation_steps == 2
    assert train.learning_rate == pytest.approx(1e-4)
    assert ft.finetuning_type == "lora"
    assert ft.lora_rank == 8 and ft.lora_alpha == 16
    assert ft.loss_weight_lm == 1.0
    assert model.compute_dtype == "bfloat16"  # resolved from bf16 flag


def test_reference_generate_yaml_parses():
    model, data, train, ft, gen = get_infer_args(
        "/root/reference/config/generate/llama_drug.yaml"
    )
    assert gen.max_new_tokens == 128
    assert gen.temperature == pytest.approx(0.6)
    assert gen.top_p == pytest.approx(0.9)
    assert data.cutoff_len == 128


def test_dict_args_and_validation():
    with pytest.raises(ValueError):
        get_train_args({"do_train": True, "dataset": "x"})  # no output_dir
    model, data, train, ft, gen = get_train_args(
        {"do_train": True, "dataset": "x", "output_dir": "/tmp/o", "learning_rate": "1.0e-4"}
    )
    assert train.learning_rate == pytest.approx(1e-4)


def test_unknown_keys_ignored():
    parse_args({"definitely_not_a_key": 1})


def test_malformed_yaml_raises_value_error(tmp_path):
    """Broken YAML / non-mapping content must surface as ValueError, not
    yaml internals (fuzz finding)."""
    import pytest

    from llamole_tpu.config import get_train_args

    bad = tmp_path / "bad.yaml"
    bad.write_text("model_name_or_path: 'x'\n:: not yaml ::\n")
    with pytest.raises(ValueError, match="not valid YAML"):
        get_train_args(str(bad))
    lst = tmp_path / "list.yaml"
    lst.write_text("- a\n- b\n")
    with pytest.raises(ValueError, match="must contain a mapping"):
        get_train_args(str(lst))


def test_kv_cache_dtype_threads_to_llm_config():
    """ModelArguments.kv_cache_dtype reaches LLMConfig (serving knob:
    int8 quantize-on-write cache, gllm/model.py _quantize_kv)."""
    import jax
    import pytest

    from llamole_tpu.config import ModelArguments
    from llamole_tpu.data.tokenizer import load_tokenizer
    from llamole_tpu.models.loader import load_llm

    margs = ModelArguments(model_name_or_path="", kv_cache_dtype="int8")
    tok = load_tokenizer(margs)
    llm, _ = load_llm(margs, tok, jax.random.PRNGKey(0))
    assert llm.cfg.kv_cache_dtype == "int8"

    bad = ModelArguments(model_name_or_path="", kv_cache_dtype="fp8")
    with pytest.raises(ValueError, match="kv_cache_dtype"):
        load_llm(bad, tok, jax.random.PRNGKey(0))
