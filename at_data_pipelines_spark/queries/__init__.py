"""Query registry package — import all topic modules to populate REGISTRY."""

from .registry import QUERIES, ORACLES, register  # noqa: F401

from . import relational  # noqa: F401,E402
from . import windows  # noqa: F401,E402
from . import llm  # noqa: F401,E402
from . import streaming_q  # noqa: F401,E402
from . import subqueries  # noqa: F401,E402
from . import sketches  # noqa: F401,E402

# Pin the driver-gate window: the driver checks the first 50 dict entries,
# so the registry is reordered to the committed gate declaration (fails
# loudly if a query was added without updating gate.py).
from .gate import order_registry as _order_registry  # noqa: E402

_order_registry(QUERIES, ORACLES)
