from zebra_tpu.ops.metrics import masked_ap, masked_auc, masked_rank_acc

__all__ = ["masked_ap", "masked_auc", "masked_rank_acc"]
