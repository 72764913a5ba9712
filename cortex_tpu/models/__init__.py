"""Model zoo: the reference's example families, TPU-first."""

from .lgssm import LGSSM

__all__ = ["LGSSM"]
