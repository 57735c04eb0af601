from ruvector_tpu.parallel.mesh import make_mesh, device_count
from ruvector_tpu.parallel.partition import HaloPlan, build_halo_plan, block_partition
from ruvector_tpu.parallel.halo import (
    halo_exchange,
    make_sharded_layer_forward,
    make_sharded_train_step,
    make_sharded_mp_forward,
    make_blocked_layer_forward,
    make_blocked_train_step,
)
from ruvector_tpu.parallel.ep import (
    EpConfig,
    ep_init,
    make_ep_forward,
    reference_ep_forward,
)
from ruvector_tpu.parallel.pp import (
    make_pp_forward,
    reference_pp_forward,
)
from ruvector_tpu.parallel.sp import (
    make_ring_attention,
    reference_attention,
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
    "make_blocked_layer_forward",
    "make_blocked_train_step",
    "TpLayerConfig",
    "EpConfig",
    "ep_init",
    "make_ep_forward",
    "reference_ep_forward",
    "make_pp_forward",
    "make_ring_attention",
    "reference_attention",
    "reference_pp_forward",
    "tp_layer_init",
    "tp_param_specs",
    "make_tp_layer_forward",
]
