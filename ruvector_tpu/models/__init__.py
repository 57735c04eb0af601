from ruvector_tpu.models.ruvector_net import (
    RuvectorNetConfig,
    ruvector_net_init,
    ruvector_net_apply,
)
from ruvector_tpu.models.graphsage import (
    GraphSAGEConfig,
    GraphSAGENetConfig,
    graphsage_init,
    graphsage_apply,
    graphsage_net_init,
    graphsage_net_apply,
    sample_fanout,
)
from ruvector_tpu.models.gcn import GCNConfig, gcn_init, gcn_apply
from ruvector_tpu.models.gat import GATConfig, gat_init, gat_apply

__all__ = [
    "RuvectorNetConfig",
    "ruvector_net_init",
    "ruvector_net_apply",
    "GraphSAGEConfig",
    "GraphSAGENetConfig",
    "graphsage_net_init",
    "graphsage_net_apply",
    "graphsage_init",
    "graphsage_apply",
    "sample_fanout",
    "GCNConfig",
    "gcn_init",
    "gcn_apply",
    "GATConfig",
    "gat_init",
    "gat_apply",
]
