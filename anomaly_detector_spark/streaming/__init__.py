from .debounce import debounce_batch, debounced_anomalies_stream  # noqa: F401
from .drift import drift_stream  # noqa: F401
from .loads import extract_loads_stream  # noqa: F401
from .validate import validate_stream, with_staleness_filter  # noqa: F401
from .windowed import windowed_stats_stream  # noqa: F401
