from transmvsnet_tpu.convert.torch_weights import (
    convert_state_dict,
    load_torch_checkpoint,
)
