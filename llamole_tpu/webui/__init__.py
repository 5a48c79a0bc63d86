from .workflow import load_model_and_tokenizer, process_input, generate
