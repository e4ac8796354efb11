"""Query/pipeline registry package.

Importing this package populates the registry with every named query
(the driver contract surface). Submodules register via the @query
decorator in .registry.
"""

from . import registry
from .registry import REGISTRY, Query, query

# Import for registration side effects — order groups the registry roughly
# by SURVEY.md §2 section.
from . import relational  # noqa: E402  §2.2-2.8 relational core
from . import windows  # noqa: E402  §2.5 window functions
from . import clickstream  # noqa: E402  reference-domain pipelines over events
from . import text  # noqa: E402  text analysis + dedup (extensions)
from . import vectors  # noqa: E402  similarity search (extensions)
from . import extensions  # noqa: E402  pivot/subqueries/UDAF/simhash/ANN
from ..streaming import batch_twins  # noqa: E402  streaming ops with oracles
from . import sources_ops  # noqa: E402  §2.1 sources/sinks + J5/T8/U1 surface
from . import multimodal_ops  # noqa: E402  north-star multimodal columns

__all__ = ["REGISTRY", "Query", "query", "registry"]
