"""Host-side run scheduling: overlay cadence, best-loss tracking, LR drops.

Reference semantics: apply_overlay (/root/reference/pixray.py:1431-1434), checkdrop
best-loss staleness tracking (pixray.py:1090-1109), LR-drop divisor handling
(pixray.py:520-529, 1496-1511).  These are control decisions made between jitted
steps, so they stay in Python by design.
"""

from __future__ import annotations

from dataclasses import dataclass


def apply_overlay(args, cur_it: int) -> bool:
    """Should the overlay image be re-composited onto the latent at this iteration?"""
    return (
        args.overlay_image is not None
        and (cur_it % args.overlay_every) == args.overlay_offset
        and ((args.overlay_until is None) or (cur_it < args.overlay_until))
    )


ITER_DROP_DELAY = 12  # reference pixray.py:1987


@dataclass
class BestTracker:
    """Tracks the best loss seen and signals when an LR drop is due."""

    best_loss: float = 1e20
    best_iter: int = 0
    best_params: object = None
    num_loss_drop: int = 0
    max_loss_drops: int = 2
    iter_drop_delay: int = ITER_DROP_DELAY

    def check(self, cur_iter: int, loss_sum: float, params=None) -> bool:
        """Record ``loss_sum``; return True when staleness warrants an LR drop."""
        if loss_sum < self.best_loss:
            self.best_loss = loss_sum
            self.best_iter = cur_iter
            if params is not None:
                self.best_params = params
            return False
        return (cur_iter - self.best_iter) >= self.iter_drop_delay

    def register_drop(self, cur_iter: int) -> bool:
        """Apply a drop; returns False when the run should stop (drops exhausted)."""
        self.num_loss_drop += 1
        if self.num_loss_drop > self.max_loss_drops:
            return False
        self.best_iter = cur_iter
        self.best_loss = 1e20
        return True

    @property
    def staleness_and_best(self):
        return self.best_iter, self.best_loss

    @property
    def drop_divisor(self) -> float:
        return 10.0 ** self.num_loss_drop
