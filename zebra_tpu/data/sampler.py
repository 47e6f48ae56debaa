"""Negative edge sampling.

Uniform over the unique source / destination node populations of the stream
being evaluated, optionally with a fixed RandomState so val/test negatives are
reproducible across epochs (reference utils/util.py:69-86; seeds 0-3 are wired
in reference train.py:141-144 and asserted at eval time, evaluation.py:9-10).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class RandEdgeSampler:
    def __init__(self, src_list, dst_list, seed: Optional[int] = None):
        self.seed = seed
        self.src_list = np.unique(np.asarray(src_list))
        self.dst_list = np.unique(np.asarray(dst_list))
        if seed is not None:
            self.random_state = np.random.RandomState(seed)

    def sample(self, size: int) -> Tuple[np.ndarray, np.ndarray]:
        if self.seed is None:
            src_index = np.random.randint(0, len(self.src_list), size)
            dst_index = np.random.randint(0, len(self.dst_list), size)
        else:
            src_index = self.random_state.randint(0, len(self.src_list), size)
            dst_index = self.random_state.randint(0, len(self.dst_list), size)
        return self.src_list[src_index], self.dst_list[dst_index]

    def sample_with(self, rs: np.random.RandomState,
                    size: int) -> Tuple[np.ndarray, np.ndarray]:
        """One (src, dst) draw from an explicit RandomState. Used for
        per-epoch training negatives derived from (base, epoch): the same
        uniform protocol as the reference's shared unseeded sampler
        (reference train.py:203), but any epoch's draw can be regenerated
        independently — which makes next-epoch prefetch and mid-epoch resume
        exact."""
        src_index = rs.randint(0, len(self.src_list), size)
        dst_index = rs.randint(0, len(self.dst_list), size)
        return self.src_list[src_index], self.dst_list[dst_index]

    def reset_random_state(self):
        assert self.seed is not None
        self.random_state = np.random.RandomState(self.seed)

    def sample_eval_negatives(self, n: int, bs: int) -> np.ndarray:
        """Negatives for a whole eval stream in the reference's exact draw
        order: the seeded RandomState is reset, then consumed batch-by-batch
        as interleaved (src, dst) draws of min(bs, remaining) — matching the
        per-batch ``sampler.sample(size)`` calls of reference
        evaluation.py:10,30-31 bit-for-bit (the dst draws are the negatives
        actually used)."""
        self.reset_random_state()
        negs = np.empty(n, dtype=self.dst_list.dtype)
        for lo in range(0, n, bs):
            size = min(bs, n - lo)
            _, dst = self.sample(size)
            negs[lo : lo + size] = dst
        return negs
