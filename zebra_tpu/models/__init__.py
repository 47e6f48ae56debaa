from zebra_tpu.models.time_encoding import time_basis, time_encode
from zebra_tpu.models.cells import gru_apply, gru_init, rnn_apply, rnn_init
from zebra_tpu.models.memory import MemoryState, init_memory
from zebra_tpu.models.tgn import TgnParams, init_tgn_params

__all__ = [
    "time_basis",
    "time_encode",
    "gru_apply",
    "gru_init",
    "rnn_apply",
    "rnn_init",
    "MemoryState",
    "init_memory",
    "TgnParams",
    "init_tgn_params",
]
