from . import (  # noqa: F401
    cuckoo,
    dedup,
    multimodal,
    politeness,
    robots,
    search,
    seen,
    similarity,
)
