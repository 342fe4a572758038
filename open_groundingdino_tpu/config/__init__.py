from .slconfig import SLConfig  # noqa: F401
