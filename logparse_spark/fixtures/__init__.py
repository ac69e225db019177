from .gen_transcripts import ensure_fixture, gen_transcripts  # noqa: F401
