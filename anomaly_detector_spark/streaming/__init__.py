from .debounce import debounce_batch, debounced_anomalies_stream  # noqa: F401
from .dedup import dedup_stream  # noqa: F401
from .drift import drift_stream  # noqa: F401
from .loads import extract_loads_stream  # noqa: F401
from .novelty import history_draws, novelty_stream  # noqa: F401
from .quantiles import quantile_stream  # noqa: F401
from .sequence import sequence_alerts_stream  # noqa: F401
from .topk import topk_stream  # noqa: F401
from .validate import validate_stream, with_staleness_filter  # noqa: F401
from .windowed import windowed_stats_stream  # noqa: F401
