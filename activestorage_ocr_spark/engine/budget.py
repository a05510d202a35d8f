"""Per-document wall-clock budget — the Spark analog of the reference's
request timeouts (`lib/activestorage/ocr/configuration.rb:58-59`:
``request_timeout = 30`` s, ``connect_timeout = 5`` s; SURVEY.md §1.1 maps
them to "per-stage guards").

In the reference, a pathological payload is bounded by the HTTP client's
request timeout. In a batch Spark job there is no request boundary: one
zlib bomb or a giant deskew search inside the ``mapInArrow`` kernel would
straggle a task for minutes while every other core idles. The analog is a
wall cap on each document INSIDE the kernel — overruns become a quarantine
row with the stable ``TIMEOUT`` code (O6 vocabulary), never a task
straggler and never a raised error (O7).

Mechanism: cooperative deadline checks. ``extract_document`` arms a
thread-local deadline; the engine's loop-shaped hot paths (preprocess step
boundaries, deskew angle search, OCR line bands, per-image PDF fallback)
call :func:`check`, which raises :class:`DocTimeout` once the deadline
passes. Cooperative checks cannot interrupt a single C-level call (one
``zlib.decompress``, one numpy kernel), so the overrun is bounded by the
largest uninterruptible unit — acceptable because the decode-bomb size
guards already cap those units, and anything finer would need signals
(unsafe off the main thread; Spark gives no such guarantee for Python
workers).

``check()`` is an attribute fetch + compare when no deadline is armed, so
sprinkling it in loops costs nothing on the untimed path.
"""

from __future__ import annotations

import threading
import time

__all__ = ["DocTimeout", "deadline", "check", "active_timeout_ms"]


class DocTimeout(Exception):
    """Raised by :func:`check` when the armed per-document deadline passed."""


_state = threading.local()


class deadline:  # noqa: N801 — context-manager used as a lowercase verb
    """Arm a per-document deadline for the enclosed block.

    ``timeout_ms`` of ``None`` or ``<= 0`` disables the budget (checks become
    no-ops). Always clears on exit so a timed-out document never leaks its
    deadline into the next one.
    """

    def __init__(self, timeout_ms: int | None):
        self.timeout_ms = timeout_ms

    def __enter__(self) -> "deadline":
        if self.timeout_ms and self.timeout_ms > 0:
            _state.deadline = time.monotonic() + self.timeout_ms / 1000.0
            _state.timeout_ms = self.timeout_ms
        else:
            _state.deadline = None
            _state.timeout_ms = None
        return self

    def __exit__(self, *exc) -> None:
        _state.deadline = None
        _state.timeout_ms = None


def check() -> None:
    """Raise :class:`DocTimeout` if the armed deadline has passed (no-op when
    no deadline is armed)."""
    dl = getattr(_state, "deadline", None)
    if dl is not None and time.monotonic() > dl:
        raise DocTimeout(
            f"document exceeded its {_state.timeout_ms} ms processing budget"
        )


def active_timeout_ms() -> int | None:
    """The currently armed budget (for warnings/diagnostics), or None."""
    return getattr(_state, "timeout_ms", None)
