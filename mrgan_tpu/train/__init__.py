from . import gan, optim, protocol, schedule  # noqa: F401
