from .config import LLMConfig
from .continuous import SlotDecoder
from .model import LLM
from .lora import init_lora, merge_lora, lora_pspecs, lora_scale
