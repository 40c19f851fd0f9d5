from . import corpus, dedup, grouped, loads, multimodal, ranges, similarity, text, windows  # noqa: F401
