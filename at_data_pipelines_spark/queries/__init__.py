"""Query registry package — import all topic modules to populate REGISTRY."""

from .registry import QUERIES, ORACLES, register  # noqa: F401

from . import relational  # noqa: F401,E402
from . import windows  # noqa: F401,E402
from . import llm  # noqa: F401,E402
from . import streaming_q  # noqa: F401,E402
from . import subqueries  # noqa: F401,E402
