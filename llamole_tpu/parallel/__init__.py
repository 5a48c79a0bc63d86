from .mesh import create_mesh, mesh_from_string
from .sharding import llm_param_pspecs, shard_params, replicate, zero1_opt_pspecs
from .pipeline import (pipeline_decoder_forward, pipeline_lm_loss,
                       pipeline_param_pspecs)
