from .suite import default_suite, run_suite  # noqa: F401
