from . import fetch, snapshots  # noqa: F401
