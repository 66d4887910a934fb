from . import hashing, serde  # noqa: F401
