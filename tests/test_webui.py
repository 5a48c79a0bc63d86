"""webui pipeline test (model side only — gradio itself is optional)."""

import numpy as np
import pytest


@pytest.mark.slow
def test_webui_pipeline_single_example():
    from llamole_tpu.webui.workflow import (
        generate, load_model_and_tokenizer, process_input)

    state = load_model_and_tokenizer({
        "model_name_or_path": "",
        "template": "default",
        "cutoff_len": 96,
        "max_new_tokens": 6,
        "temperature": 0.6,
        "top_p": 0.9,
        "learned_query_size": 8,
        "lora_rank": 4,
    })
    batch = process_input(state, "Design a small polar molecule.",
                          {"SC": 2.0, "SA": 2.0})
    assert batch["input_ids"].shape[0] == 1
    info = generate(state, batch, do_retrosynthesis=False)
    assert len(info["smiles_list"]) == 1
    assert info["text_lists"][0]
