from .base import GaussianRenderer  # noqa: F401
from .depth_first import DepthFirstRenderer  # noqa: F401
from .global_ import GlobalRenderer  # noqa: F401
from .hardware import HardwareRenderer  # noqa: F401
from .local import LocalRenderer  # noqa: F401
