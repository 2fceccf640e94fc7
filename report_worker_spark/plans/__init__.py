from .catalog import ORACLE, QUERIES, flagship  # noqa: F401
