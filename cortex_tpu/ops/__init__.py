"""Batched update-rule kernels and scan formulations of chain message passing."""

from .chains import (
    ChainMarginals,
    lgssm_messages_scan,
    lgssm_smooth_assoc,
    lgssm_smooth_scan,
)

__all__ = [
    "ChainMarginals",
    "lgssm_smooth_scan",
    "lgssm_smooth_assoc",
    "lgssm_messages_scan",
]
