from zebra_tpu.train.step import train_chunk, eval_chunk, flush_pending_messages
from zebra_tpu.train.loop import Trainer

__all__ = ["train_chunk", "eval_chunk", "flush_pending_messages", "Trainer"]
