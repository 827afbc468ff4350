from .base import GaussianRenderer  # noqa: F401
from .depth_first import DepthFirstRenderer  # noqa: F401
from .global_ import GlobalRenderer  # noqa: F401
