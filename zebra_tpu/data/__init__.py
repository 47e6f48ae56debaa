from zebra_tpu.data.dataset import Data, DatasetSplits, get_data, load_feat
from zebra_tpu.data.sampler import RandEdgeSampler
from zebra_tpu.data.synthetic import synthetic_stream

__all__ = [
    "Data",
    "DatasetSplits",
    "get_data",
    "load_feat",
    "RandEdgeSampler",
    "synthetic_stream",
]
