from .base import CheckResult, CheckSpec, check_id  # noqa: F401
