from . import images, output

__all__ = ["images", "output"]
