"""Extension-operator queries (SURVEY.md §2.C): dedup, similarity search,
text analysis, as-of join, streaming. Registered into the same oracle-checked
registry as the relational surface. Populated incrementally."""

from __future__ import annotations
