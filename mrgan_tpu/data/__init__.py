from . import mreo, synthetic  # noqa: F401
