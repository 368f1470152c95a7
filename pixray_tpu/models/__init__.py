from .perceptor import Perceptor, get_clip_perceptor

__all__ = ["Perceptor", "get_clip_perceptor"]
