from . import device_aug  # noqa: F401
