from . import features, mel, resample, scaler  # noqa: F401
