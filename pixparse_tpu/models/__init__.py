from pixparse_tpu.models.bart import BartCausalDecoder, BartDecoderCfg, resolve_bart_cfg
from pixparse_tpu.models.config import (
    ImageEncoderCfg,
    ModelCfg,
    TextDecoderCfg,
    get_model_config,
    list_models,
)
from pixparse_tpu.models.cruller import Cruller, resolve_cruller_cfgs
from pixparse_tpu.models.vit import ViT, ViTCfg, resolve_vit_cfg
