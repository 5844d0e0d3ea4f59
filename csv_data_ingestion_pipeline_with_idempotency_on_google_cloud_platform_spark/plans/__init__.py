from .queries import ORACLE_SQL, QUERIES  # noqa: F401
