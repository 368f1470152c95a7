from .configs import CLIP_CONFIGS, SLIP_CONFIGS, CLIPConfig
from .model import CLIP
from .tokenizer import SimpleTokenizer, tokenize

__all__ = ["CLIP", "CLIPConfig", "CLIP_CONFIGS", "SLIP_CONFIGS", "SimpleTokenizer", "tokenize"]
