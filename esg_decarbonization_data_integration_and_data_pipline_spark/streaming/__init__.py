"""Structured Streaming extension surface (SURVEY.md §2.11)."""

from __future__ import annotations

import hashlib


def checkpoint_identity(checkpoint: str) -> str:
    """The checkpoint-identity prefix of every versioned-sink
    transaction marker ("<identity>:<batch_id>" and variants).  ONE
    definition on purpose: the marker format is the cross-sink
    exactly-once contract -- a replayed micro-batch is refused
    because its marker matches -- and independently maintained
    copies of the hash recipe could drift apart and silently break
    replay refusal."""
    return hashlib.md5(checkpoint.encode()).hexdigest()[:12]
