from .nn import (
    dense,
    dense_init,
    layer_norm,
    layer_norm_init,
    mlp_init,
    mlp_apply,
)
from .attention import masked_attention
