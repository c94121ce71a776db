"""EMA FPS meter (reference: src/io_video/fps_meter.py:3-18).

fps ← (1-α)·fps + α·(1/dt), dt floored at 1e-6, first tick returns 0.0.
"""
from __future__ import annotations

import time


class FPSMeter:
    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self._prev = None
        self.fps = 0.0

    def tick(self, now: float = None) -> float:
        now = now or time.time()
        if self._prev is None:
            self._prev = now
            return self.fps
        dt = max(1e-6, now - self._prev)
        self.fps = (1 - self.alpha) * self.fps + self.alpha * (1.0 / dt)
        self._prev = now
        return self.fps
