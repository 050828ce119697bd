"""Loader error type with credential redaction.

Behavioral contract from the reference's ``LoaderError``
(/root/reference/lib/utils.ts:81-98): errors carry a code and optional
details, and any SQL text attached to the error has its credentials
clause scrubbed before the error is surfaced (utils.ts:91 —
``CREDENTIALS [^\n]+`` → ``CREDENTIALS ='SECRET_XXXX'``).
"""

from __future__ import annotations

import re
from typing import Any

_CREDENTIALS_RE = re.compile(r"CREDENTIALS [^\n]+", re.IGNORECASE)
_REDACTED = "CREDENTIALS ='SECRET_XXXX'"

# Error codes mirrored from the reference's observable surface.
RS_COPY_ERROR = "RS_COPY_ERROR"  # lib/core.ts:46
RS_LOAD_STARTED = "RS_LOAD_STARTED"  # lib/RedshiftLoader.ts:137-142
NO_FILES = "NO_FILES"  # lib/RedshiftLoader.ts:277-279


def redact_credentials(text: str) -> str:
    """Scrub credential clauses from SQL text (utils.ts:91)."""
    return _CREDENTIALS_RE.sub(_REDACTED, text)


class LoaderError(Exception):
    """Error with a stable ``code``, optional ``details`` and a
    redacted ``query`` attribute (utils.ts:81-98)."""

    def __init__(
        self,
        code: str,
        message: str | None = None,
        *,
        details: Any = None,
        query: str | None = None,
    ) -> None:
        self.code = code
        self.details = details
        self.query = redact_credentials(query) if query is not None else None
        super().__init__(message or code)

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return f"LoaderError(code={self.code!r}, message={self.args[0]!r})"
