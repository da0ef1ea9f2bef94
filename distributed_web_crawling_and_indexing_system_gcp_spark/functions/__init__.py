from . import hashing, html, text, urls  # noqa: F401
