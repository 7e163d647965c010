"""I/O: idempotent writers mirroring the reference's load policies."""
