from ruvector_tpu.parallel.mesh import make_mesh, device_count
from ruvector_tpu.parallel.partition import HaloPlan, build_halo_plan, block_partition
from ruvector_tpu.parallel.halo import (
    halo_exchange,
    make_sharded_layer_forward,
    make_sharded_train_step,
    make_sharded_mp_forward,
)
from ruvector_tpu.parallel.tp import (
    TpLayerConfig,
    tp_layer_init,
    tp_param_specs,
    make_tp_layer_forward,
)

__all__ = [
    "make_mesh",
    "device_count",
    "HaloPlan",
    "build_halo_plan",
    "block_partition",
    "halo_exchange",
    "make_sharded_layer_forward",
    "make_sharded_train_step",
    "make_sharded_mp_forward",
    "TpLayerConfig",
    "tp_layer_init",
    "tp_param_specs",
    "make_tp_layer_forward",
]
