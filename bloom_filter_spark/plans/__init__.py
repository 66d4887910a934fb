from .queries import QUERIES, ORACLES, flagship  # noqa: F401
