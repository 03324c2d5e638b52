from . import decision_tables, textnorm  # noqa: F401
