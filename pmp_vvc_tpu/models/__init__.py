from .qbd import ChromaMSBDNet, ChromaQNet, LumaMSBDNet, LumaQNet
from .checkpoint import (
    import_torch_state_dict,
    load_params,
    load_reference_net,
    save_params,
    torch_pickle_to_flat,
)

__all__ = [
    "LumaQNet", "LumaMSBDNet", "ChromaQNet", "ChromaMSBDNet",
    "save_params", "load_params", "load_reference_net",
    "import_torch_state_dict", "torch_pickle_to_flat",
]
