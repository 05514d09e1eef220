"""HTTP-outcome error taxonomy with per-type retry policy.

Rebuilds the reference's ``classify_error`` + retry-policy table
(``SP/src/common/retry_strategies.py:17-101``): errors are classified into a
small closed set and only the *transient* classes re-enqueue (up to
MAX_ATTEMPTS); permanent classes (404/410, other 4xx) enter the seen set on
first contact and are never retried.

Shared by BOTH engines: the Spark fetch UDF (operators/fetch.py) and the
sequential oracle (plans/oracle.py) call this exact function, so the
classification can never drift between them; the crawl plan's re-enqueue
filter tests ``error_type IN RETRYABLE_TYPES`` JVM-side on the column this
function produced.
"""

from __future__ import annotations

# transient classes: re-enqueue while attempts remain
RETRYABLE_TYPES = ("timeout", "throttled", "server_error")


def classify_error(status_code: int) -> str | None:
    """Status code -> error class (None = success / redirect, no error).

    Mirrors retry_strategies.py:17-101: timeouts and 5xx are transient,
    429 is throttling (transient with backoff), 404/410 are permanent
    not-found, remaining 4xx are permanent client errors.
    """
    if status_code == 599:  # client-side timeout convention
        return "timeout"
    if status_code == 429:
        return "throttled"
    if status_code >= 500:
        return "server_error"
    if status_code in (404, 410):
        return "not_found"
    if status_code >= 400:
        return "client_error"
    return None


def is_retryable(error_type: str | None) -> bool:
    return error_type in RETRYABLE_TYPES
