from .hashing import with_content_sha  # noqa: F401
from .timeparse import tolerant_timestamp  # noqa: F401
