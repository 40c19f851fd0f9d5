from . import (  # noqa: F401
    corpus,
    dedup,
    grouped,
    layout,
    loads,
    multimodal,
    ranges,
    similarity,
    text,
    windows,
)
