from . import image, losses, metrics, tiling  # noqa: F401
