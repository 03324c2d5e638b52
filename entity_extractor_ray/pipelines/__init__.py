from .kg_build import build_kg, KGResult  # noqa: F401
