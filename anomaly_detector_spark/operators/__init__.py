from . import dedup, loads, multimodal, similarity, text, windows  # noqa: F401
