from .settings import (
    apply_settings,
    get_learning_rate_drops,
    process_args,
    setup_parser,
)

__all__ = ["apply_settings", "get_learning_rate_drops", "process_args", "setup_parser"]
