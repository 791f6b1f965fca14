"""HBM budgeting and live memory stats.

TPU re-design of the reference's VRAM-exhaustion protection
(reference: src/utils/memory_monitor.hpp:25-131, trainer VRAM gate
trainer.cpp:343-373): on TPU the fixed-capacity state makes steady-state OOM
impossible by construction, so the budget check moves to *configuration time*
— estimate the footprint of a (capacity, resolution, pair_capacity) choice
against the device's reported HBM and fail fast / auto-shrink instead of
monitoring per iteration.
"""
from __future__ import annotations

import dataclasses

import jax

BYTES_F32 = 4


@dataclasses.dataclass
class MemoryEstimate:
    params_mb: float
    adam_mb: float
    pairs_mb: float
    image_mb: float
    total_mb: float

    def __str__(self):
        return (
            f"params {self.params_mb:.0f} MB + adam {self.adam_mb:.0f} MB + "
            f"pairs {self.pairs_mb:.0f} MB + images {self.image_mb:.0f} MB "
            f"= {self.total_mb:.0f} MB"
        )


def estimate_train_memory_mb(
    capacity: int,
    sh_coeffs: int = 16,
    pair_capacity: int = 1 << 21,
    img_h: int = 1080,
    img_w: int = 1920,
    num_cached_images: int = 0,
) -> MemoryEstimate:
    """Rough (lower-bound) HBM footprint of a training configuration.

    Per-Gaussian floats: 3 pos + 4 quat + 3 scale + 1 opac + 3*C sh
    (reference estimator: memory_monitor.hpp:124-131), x3 for Adam m/v.
    """
    per_gauss = 3 + 4 + 3 + 1 + 3 * sh_coeffs
    params = capacity * per_gauss * BYTES_F32
    adam = 2 * params
    # pair list: sorted attrs (16 rows) + keys/indices (~4 ints)
    pairs = pair_capacity * (16 + 4) * BYTES_F32
    image = num_cached_images * img_h * img_w * 3 * BYTES_F32
    total = params + adam + pairs + image
    mb = 1.0 / (1024 * 1024)
    return MemoryEstimate(
        params_mb=params * mb,
        adam_mb=adam * mb,
        pairs_mb=pairs * mb,
        image_mb=image * mb,
        total_mb=total * mb,
    )


def device_memory_stats(device=None) -> dict:
    """Live HBM stats from the device (bytes), empty dict if unsupported."""
    dev = device if device is not None else jax.devices()[0]
    try:
        stats = dev.memory_stats()
        return dict(stats) if stats else {}
    except Exception:
        return {}


class MemoryWatchdog:
    """Runtime HBM monitor with graceful-abort semantics — the TPU analogue
    of the reference's 5-part OOM-freeze protection (reference:
    src/training/trainer.cpp:343-373, src/utils/memory_monitor.hpp:25-131).

    The config-time estimate (check_memory_budget) is a lower bound: autodiff
    residuals, SSIM buffers, and compiler transients are not in it. This
    watchdog reads live device stats on the Trainer's logging cadence;
    `max_critical_streak` consecutive readings above the limit trigger a
    checkpoint-and-abort instead of an XLA OOM (which on shared TPU runtimes
    can wedge the process the way WDDM wedges the reference's GPU).

    limit_mb=0 auto-derives the limit from the device's reported HBM minus
    `auto_margin_mb`. On backends without memory stats (CPU) the watchdog is
    inert unless a `stats_fn` is injected (tests do)."""

    def __init__(self, limit_mb: float = 0.0, auto_margin_mb: float = 600.0,
                 critical_margin_mb: float = 200.0,
                 max_critical_streak: int = 5, stats_fn=None, log=print):
        self._stats_fn = stats_fn or device_memory_stats
        self.log = log
        self.max_critical_streak = max_critical_streak
        self.critical_margin_mb = critical_margin_mb
        self.streak = 0
        self.last_used_mb = 0.0
        if limit_mb > 0:
            self.limit_mb = limit_mb
        else:
            limit = self._stats_fn().get("bytes_limit")
            if limit:
                self.limit_mb = limit / (1024 * 1024) - auto_margin_mb
            else:
                self.limit_mb = 0.0  # no stats available -> inert
        self.enabled = self.limit_mb > 0

    def check(self) -> str:
        """One reading: returns "ok" | "warning" | "critical" and updates the
        critical streak."""
        if not self.enabled:
            return "ok"
        stats = self._stats_fn()
        used = stats.get("bytes_in_use")
        if used is None:
            return "ok"
        self.last_used_mb = used / (1024 * 1024)
        if self.last_used_mb > self.limit_mb:
            self.streak += 1
            self.log(
                f"HBM CRITICAL: {self.last_used_mb:.0f} MB in use > limit "
                f"{self.limit_mb:.0f} MB (streak "
                f"{self.streak}/{self.max_critical_streak})"
            )
            return "critical"
        self.streak = 0
        if self.last_used_mb > self.limit_mb - self.critical_margin_mb:
            return "warning"
        return "ok"

    def should_abort(self) -> bool:
        return self.enabled and self.streak >= self.max_critical_streak


def check_memory_budget(capacity: int, sh_coeffs: int, pair_capacity: int,
                        img_h: int, img_w: int, num_cached_images: int,
                        headroom_mb: float = 512.0):
    """Raise early if the configuration cannot fit in device HBM
    (the analogue of the reference's graceful-abort VRAM gate)."""
    est = estimate_train_memory_mb(
        capacity, sh_coeffs, pair_capacity, img_h, img_w, num_cached_images
    )
    stats = device_memory_stats()
    limit = stats.get("bytes_limit")
    if limit:
        limit_mb = limit / (1024 * 1024)
        if est.total_mb + headroom_mb > limit_mb:
            raise MemoryError(
                f"configuration needs ~{est.total_mb:.0f} MB + {headroom_mb:.0f} MB "
                f"headroom but device HBM is {limit_mb:.0f} MB; reduce capacity, "
                f"pair_capacity, or resolution ({est})"
            )
    return est
