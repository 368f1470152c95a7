from . import images, output
from .prefetch import IOConsumer, PrefetchReader

__all__ = ["images", "output", "IOConsumer", "PrefetchReader"]
