from .transcripts import generate_turns, write_turns, TurnCorpusSpec  # noqa: F401
