from .schemes import (
    QLinearConfig,
    QExpertConfig,
    QLayerConfig,
    QModelConfig,
    parse_scheme,
    strategy_bits,
    build_uniform_expert,
    build_uniform_layer,
    build_uniform_model,
    LINEAR_NAMES,
)
from .rtn import quantize, dequantize, fake_quant, fake_quant_weight, fake_quant_act
from .packing import (
    PackedTensor,
    quantize_act,
    quantize_weight_kn,
    dequantize_act,
    dequantize_weight_kn,
)
from .hadamard import (
    fwht,
    hadamard_matrix,
    matmul_hadU,
    random_hadamard_matrix,
    get_had_factor,
)
