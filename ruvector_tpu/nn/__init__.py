from ruvector_tpu.nn.core import (
    linear_init,
    linear_apply,
    layer_norm_init,
    layer_norm_apply,
    mha_init,
    mha_apply,
    gru_init,
    gru_apply,
    xavier_normal,
    he_normal,
)
from ruvector_tpu.nn.ruvector_layer import (
    RuvectorLayerConfig,
    ruvector_layer_init,
    ruvector_layer_apply,
)

__all__ = [
    "linear_init",
    "linear_apply",
    "layer_norm_init",
    "layer_norm_apply",
    "mha_init",
    "mha_apply",
    "gru_init",
    "gru_apply",
    "xavier_normal",
    "he_normal",
    "RuvectorLayerConfig",
    "ruvector_layer_init",
    "ruvector_layer_apply",
]
