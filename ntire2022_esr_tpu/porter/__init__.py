from ntire2022_esr_tpu.porter.convert import (  # noqa: F401
    load_params,
    nest,
    port_state_dict,
    save_params,
)
from ntire2022_esr_tpu.porter.reader import read_torch_checkpoint  # noqa: F401
from ntire2022_esr_tpu.porter.reparam import (  # noqa: F401
    fold_linear_block,
    fold_linear_block_tree,
)
from ntire2022_esr_tpu.porter.quant import (  # noqa: F401
    dequantize_params,
    quantize_params_int8,
)
