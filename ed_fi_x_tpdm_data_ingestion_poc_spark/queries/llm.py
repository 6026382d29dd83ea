"""LLM-data-pipeline operator queries (SURVEY.md §2.3 Q50–Q53).

Populated in the dedup/similarity/text build phase; importing this module
must stay cheap (registration only).
"""

from __future__ import annotations
