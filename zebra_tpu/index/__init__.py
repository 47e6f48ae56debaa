from zebra_tpu.index.streaming import (
    TpprState,
    TpprParams,
    init_tppr_state,
    streaming_scan,
    fill_scan,
)
from zebra_tpu.index.neighbor_finder import NeighborIndex, build_neighbor_index
from zebra_tpu.index.pruning import pruned_topk, pruned_topk_impl

__all__ = [
    "TpprState",
    "TpprParams",
    "init_tppr_state",
    "streaming_scan",
    "fill_scan",
    "NeighborIndex",
    "build_neighbor_index",
    "pruned_topk",
    "pruned_topk_impl",
]
