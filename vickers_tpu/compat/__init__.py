from vickers_tpu.compat.convert import (
    flax_to_torch_state_dict,
    load_pth_params,
    torch_state_dict_to_flax,
)

__all__ = [
    "flax_to_torch_state_dict",
    "load_pth_params",
    "torch_state_dict_to_flax",
]
