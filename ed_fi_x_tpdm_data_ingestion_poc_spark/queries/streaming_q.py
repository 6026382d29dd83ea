"""Structured Streaming queries (SURVEY.md §2.3 Q44–Q49).

Populated in the streaming build phase; each runs a bounded
(availableNow-triggered) stream over the events table and returns the final
result as a batch DataFrame so the driver can hash it.
"""

from __future__ import annotations
