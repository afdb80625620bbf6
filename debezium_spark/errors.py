"""Retriable-error handling — restart the engine on transient failures.

Reference: ``pipeline/ErrorHandler.java:1-146``. A producer failure is
RETRIABLE iff the throwable (or any cause in its chain) is a
communication exception (default: IOException) or its message matches
the ``custom.retriable.exception`` regex; a retriable failure within
``errors.max.retries`` (-1 = unlimited, 0 = disabled) restarts the
connector — the retry counter survives the restart (the replacement
ErrorHandler inherits it, :46-48) and resets on success. The embedded
engine waits ``retriable.restart.connector.wait.ms`` between restarts.

Spark re-expression: :func:`run_resilient` rebuilds the engine from a
factory and re-runs it — the restart resumes from committed offsets,
and re-delivered batches skip on the lake's commit fence, so a retried
run never duplicates effects (same recovery path as kill-and-restart).
"""

from __future__ import annotations

import re
import time

RETRIES_UNLIMITED = -1
RETRIES_DISABLED = 0

# IOException analogue (ErrorHandler.communicationExceptions():77-79):
# OSError covers IOError/ConnectionError/TimeoutError in Python 3
COMMUNICATION_EXCEPTIONS: tuple[type, ...] = (OSError,)


class ErrorHandler:
    def __init__(
        self,
        max_retries: int = RETRIES_UNLIMITED,
        custom_retriable_regex: str | None = None,
        communication_exceptions: tuple[type, ...] = COMMUNICATION_EXCEPTIONS,
        replaced: "ErrorHandler | None" = None,
    ):
        self.max_retries = max_retries
        self.custom_retriable_regex = custom_retriable_regex
        self.communication_exceptions = communication_exceptions
        # the replacement handler inherits the running retry count
        # (ErrorHandler.java:46-48) — restarts don't reset the budget
        self.retries = replaced.retries if replaced is not None else 0

    @staticmethod
    def _chain(exc: BaseException):
        # walk explicit (__cause__) AND implicit (__context__) chaining
        # — `except OSError: raise RuntimeError(...)` without `from`
        # stores the communication error in __context__, and the
        # reference's getCause() walk (:86-96) must still see it
        seen = set()
        while exc is not None and id(exc) not in seen:
            seen.add(id(exc))
            yield exc
            exc = exc.__cause__ or (
                exc.__context__ if not exc.__suppress_context__ else None
            )

    def is_retriable(self, exc: BaseException) -> bool:
        """Communication exception anywhere in the cause chain
        (:86-96)."""
        return any(
            isinstance(e, self.communication_exceptions)
            for e in self._chain(exc)
        )

    def is_custom_retriable(self, exc: BaseException) -> bool:
        """Message in the cause chain matches the configured regex —
        converts a non-retriable error to retriable (:98-113).
        Substring search, so 'connection reset' matches 'error:
        connection reset by peer' (the reference's matches() runs the
        full-message pattern users write with .* themselves; search is
        the natural Python CLI semantics)."""
        if not self.custom_retriable_regex:
            return False
        pat = re.compile(self.custom_retriable_regex)
        return any(pat.search(str(e) or "") for e in self._chain(exc))

    def has_more_retries(self) -> bool:
        """True (and consumes one retry) while budget remains; -1 is
        unlimited (:115-136)."""
        if self.max_retries == RETRIES_UNLIMITED or (
            self.retries < self.max_retries
        ):
            self.retries += 1
            return True
        return False

    def reset_retries(self) -> None:
        self.retries = 0


def run_resilient(
    engine_factory,
    run=None,
    max_retries: int = RETRIES_UNLIMITED,
    custom_retriable_regex: str | None = None,
    restart_wait: float = 0.0,
):
    """Build-and-run loop with the reference's restart semantics: on a
    retriable failure, rebuild the engine (resume from committed
    offsets — re-delivered batches fence out) and re-run; on success or
    a non-retriable/exhausted failure, return/raise.

    ``engine_factory`` → a fresh engine; ``run(engine)`` drives it
    (default ``engine.run()``); ``restart_wait`` ≙
    retriable.restart.connector.wait.ms."""
    handler = ErrorHandler(max_retries, custom_retriable_regex)
    while True:
        engine = engine_factory()
        try:
            result = engine.run() if run is None else run(engine)
        except Exception as exc:
            if (
                handler.is_retriable(exc) or handler.is_custom_retriable(exc)
            ) and handler.has_more_retries():
                if restart_wait:
                    time.sleep(restart_wait)
                continue
            raise
        handler.reset_retries()
        return result
