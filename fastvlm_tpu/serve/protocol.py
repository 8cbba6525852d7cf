"""Wire protocol shared by controller/worker/clients.

Stream format matches the reference workers: ``\\0``-delimited JSON chunks,
each carrying the cumulative text and an error code
(reference model_worker.py:122-219). Error codes mirror the reference's
envelope so clients behave identically on overload/errors.
"""

from __future__ import annotations

DELIMITER = b"\0"


class ErrorCode:
    OK = 0
    SERVER_ERROR = 1
    OUT_OF_MEMORY = 2
    OVERLOADED = 3
    CLIENT_ERROR = 4


SERVER_ERROR_MSG = (
    "**NETWORK ERROR DUE TO HIGH TRAFFIC. PLEASE REGENERATE OR REFRESH THIS PAGE.**"
)


def chunk(text: str, error_code: int = ErrorCode.OK, **extra) -> bytes:
    import json

    payload = {"text": text, "error_code": error_code}
    payload.update(extra)
    return json.dumps(payload).encode() + DELIMITER


def iter_chunks(raw_iter):
    """Reassemble \\0-delimited JSON chunks from a byte stream."""
    import json

    buf = b""
    for piece in raw_iter:
        buf += piece
        while DELIMITER in buf:
            msg, buf = buf.split(DELIMITER, 1)
            if msg:
                yield json.loads(msg.decode())
