from .rest import RestBarSource, empty_bars, fetch_daily_bars_batched  # noqa: F401
from .scrape import parse_constituent_tables  # noqa: F401
