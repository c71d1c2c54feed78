from .configs import (
    MoEConfig,
    QWEN2_MOE_A2_7B,
    QWEN2_MOE_57B,
    MIXTRAL_8X7B,
    tiny_qwen2_moe,
    tiny_mixtral,
    config_for,
)
from .layers import MoEImpl, decoder_layer, moe_block, rms_norm
from .model import (
    init_params,
    forward_hidden,
    forward_logits,
    make_forward_fn,
    layer_param_shapes,
)
from .hf_loader import (
    params_from_state_dict,
    params_from_torch_model,
    params_from_safetensors,
)
