from gamer_tpu.core.config import Config, config_field
from gamer_tpu.core.registry import Registry
from gamer_tpu.core.mesh import MeshContext, default_mesh
from gamer_tpu.core.logging import get_logger, setup_logging

__all__ = [
    "Config",
    "config_field",
    "Registry",
    "MeshContext",
    "default_mesh",
    "get_logger",
    "setup_logging",
]
