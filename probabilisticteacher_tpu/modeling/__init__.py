from . import anchors_build, backbone, detector, heads  # noqa: F401
