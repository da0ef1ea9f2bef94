from . import dedup, multimodal, politeness, robots, search, seen, similarity  # noqa: F401
