from octseg.core.config import Config, entry_point, load_config
from octseg.core.registry import (
    CLASS_COLORS_BGR,
    CLASS_COLORS_RGB,
    CLASS_IDS,
    CLASS_IDS_REVERSED,
    CLASS_MAP,
)

__all__ = [
    'Config',
    'entry_point',
    'load_config',
    'CLASS_MAP',
    'CLASS_IDS',
    'CLASS_IDS_REVERSED',
    'CLASS_COLORS_RGB',
    'CLASS_COLORS_BGR',
]
