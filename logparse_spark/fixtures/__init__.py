from .gen_transcripts import (  # noqa: F401
    ensure_fixture,
    fixture_dir,
    gen_transcripts,
    sf_from_dir,
)
