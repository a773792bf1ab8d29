"""Shared error-class extraction for Spark exceptions.

Every state/table loader in the engine absorbs ONLY the
path-not-found error class (a missing dir means "first batch" /
"no index yet"); anything else must raise. Spark 4 renamed
``getErrorClass`` to ``getCondition`` and the old name now emits a
FutureWarning per call — this helper prefers the new API and keeps
the engine warning-clean on any driver-provided Spark version
(CLAUDE.md: engine code must run on an arbitrary session).
"""

from __future__ import annotations


def error_condition(e: Exception) -> str | None:
    """The exception's error class/condition name, or None when the
    exception exposes neither accessor."""
    if hasattr(e, "getCondition"):
        return e.getCondition()
    return getattr(e, "getErrorClass", lambda: None)()
