from passt_tpu.models.passt import PaSST, PaSSTConfig
from passt_tpu.models.registry import (
    ARCHS,
    DEFAULT_CFGS,
    get_model,
    get_model_config,
    lighten_params,
    ensemble_apply,
)
from passt_tpu.models.pretrained import (
    convert_torch_state_dict,
    adapt_image_pos_embed,
    load_pretrained_params,
)

__all__ = [
    "PaSST",
    "PaSSTConfig",
    "ARCHS",
    "DEFAULT_CFGS",
    "get_model",
    "get_model_config",
    "lighten_params",
    "ensemble_apply",
    "convert_torch_state_dict",
    "adapt_image_pos_embed",
    "load_pretrained_params",
]
