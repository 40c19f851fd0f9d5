from .validate import validate_stream  # noqa: F401
