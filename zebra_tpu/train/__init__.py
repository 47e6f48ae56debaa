from zebra_tpu.train.phase import Stream, run_phase
from zebra_tpu.train.step import flush_pending_messages
from zebra_tpu.train.loop import Trainer

__all__ = ["Stream", "run_phase", "flush_pending_messages", "Trainer"]
