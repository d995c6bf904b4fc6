from . import colors, framebuffer, timing, trace  # noqa: F401
