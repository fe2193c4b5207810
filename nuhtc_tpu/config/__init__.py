from nuhtc_tpu.config.config import Config, ConfigDict, resolve_vars

__all__ = ["Config", "ConfigDict", "resolve_vars"]
